"""Pallas FAM kernel (interpret mode on CPU) vs the XLA formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tcvom_tpu.ops.fam import fam_attention as fam_xla
from tcvom_tpu.ops.fam_pallas import _fam_pallas_fwd


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize("shape,window", [((2, 8, 16, 8), 3),
                                          ((1, 16, 24, 32), 7)])
def test_fam_pallas_interpret_matches_xla(rng, shape, window, mxu):
    b, h, w, c = shape
    q = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))

    want_out, want_lg = fam_xla(q, k, mask, window)
    got_out, got_lg = _fam_pallas_fwd(q, k, mask, window, interpret=True,
                                      mxu=mxu)
    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(want_lg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)


@pytest.mark.parametrize("mxu", [False, True])
def test_fam_pallas_need_logits_false_same_out(rng, mxu):
    """The inference-only logits-skip path must not change the aggregated
    output (only the [B,H,W,window^2] logits tensor disappears)."""
    b, h, w, c, window = 1, 16, 24, 32, 7
    q = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))

    want_out, _ = _fam_pallas_fwd(q, k, mask, window, interpret=True, mxu=mxu)
    got_out, got_lg = _fam_pallas_fwd(q, k, mask, window, interpret=True,
                                      mxu=mxu, need_logits=False)
    assert got_lg is None
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=0, rtol=0)


def test_fam_pallas_mxu2_interpret_matches_xla(rng):
    """The inference-only single-matmul-pair kernel (one banded correlation
    + one reconstruction matmul, no logits output) must agree with XLA."""
    for (b, h, w, c, window) in [(1, 16, 24, 32, 7), (2, 8, 16, 8, 3)]:
        q = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))

        want_out, _ = fam_xla(q, k, mask, window)
        got_out, got_lg = _fam_pallas_fwd(q, k, mask, window, interpret=True,
                                          mxu2=True, need_logits=False)
        assert got_lg is None
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                                   atol=1e-5)


def test_fam_pallas_pad_channels_exact(rng):
    """Zero-padding q/k to 128 lanes (the narrow-channel Index path) must
    leave the attention math unchanged: zero lanes add nothing to the dots
    and the 1/sqrt(c_pad) kernel scale is compensated by pre-scaling q."""
    from tcvom_tpu.ops.fam_pallas import _pad_channels

    b, h, w, c, window = 1, 16, 24, 32, 7
    q = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))

    want_out, _ = fam_xla(q, k, mask, window)
    qp, kp = _pad_channels(q, k, 128)
    assert qp.shape[-1] == kp.shape[-1] == 128
    got_out, _ = _fam_pallas_fwd(qp, kp, mask, window, interpret=True,
                                 mxu2=True, need_logits=False)
    assert np.abs(np.asarray(got_out[..., c:])).max() == 0.0
    np.testing.assert_allclose(np.asarray(got_out[..., :c]),
                               np.asarray(want_out), atol=1e-5)
    # the logits-writing kernels agree through the same padding
    got2, lg2 = _fam_pallas_fwd(qp, kp, mask, window, interpret=True,
                                mxu=True)
    _, want_lg = fam_xla(q, k, mask, window)
    np.testing.assert_allclose(np.asarray(got2[..., :c]),
                               np.asarray(want_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(want_lg),
                               atol=1e-5)


def test_dispatch_policy_table():
    """Pin the measured dispatch policy (bench_fam.json): VPU on small f32
    grids, MXU on bf16 and wide-channel 1080p grids, XLA elsewhere."""
    from tcvom_tpu.ops.fam_pallas import _choose_impl

    assert _choose_impl(64, 64, 256, jnp.float32) == "vpu"
    assert _choose_impl(64, 64, 256, jnp.bfloat16) == "mxu"
    assert _choose_impl(136, 240, 256, jnp.float32) == "mxu"
    assert _choose_impl(136, 240, 256, jnp.bfloat16) == "mxu"
    assert _choose_impl(136, 240, 128, jnp.float32) == "xla"
    # lane misalignment / non-multiple-of-8 grids always fall back
    assert _choose_impl(136, 240, 32, jnp.float32) == "xla"
    assert _choose_impl(63, 64, 256, jnp.float32) == "xla"
