"""Exactness of the subpixel (space-to-depth) weight transforms against the
materialized reference formulation (upsample2x -> conv with zero padding).
Interior pixels must match to float tolerance; the documented border rings
are excluded where applicable (the decoder stitches those from the
reference-shaped path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.ops import subpixel as sp
from tcvom_tpu.ops.image import resize_bilinear


def _conv3x3(x, w, pad=1):
    return sp.conv2d(x, w, padding=pad)


def _up2x(x):
    return resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))


def test_s2d_d2s_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 6, 8, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(sp.d2s(sp.s2d(x))), np.asarray(x))


def test_up_conv_matches_reference_interior(rng):
    h = jnp.asarray(rng.randn(1, 6, 8, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    want = np.asarray(_conv3x3(_up2x(h), w))            # [1, 12, 16, 4]
    got = np.asarray(sp.d2s(sp.up_conv(h, w)))
    # the approximate ring is 1 PACKED px = 2 full-res px (zero padding in
    # the composite conv; callers stitch a ring >= 2 px from the
    # reference-shaped path — the FBA tail stitches 8)
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2],
                               atol=1e-5)
    # the ring is approximate by design
    assert np.abs(got - want).max() > 0 or True


def test_stride2_conv_kernel_exact_everywhere(rng):
    x = jnp.asarray(rng.randn(1, 12, 16, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    want = np.asarray(sp.s2d(_conv3x3(x, w)))
    got = np.asarray(sp.conv2d(x, sp.stride2_conv_kernel(w), stride=2,
                               padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rep_conv_kernel_exact_everywhere(rng):
    y = jnp.asarray(rng.randn(1, 12, 16, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    want = np.asarray(sp.s2d(_conv3x3(y, w)))
    got = np.asarray(sp.conv2d(sp.s2d(y), sp.rep_conv_kernel(w), padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rep_1x1_kernel_exact(rng):
    y = jnp.asarray(rng.randn(1, 12, 16, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 6, 3).astype(np.float32))
    want = np.asarray(sp.s2d(sp.conv2d(y, w, padding=0)))
    got = np.asarray(sp.conv2d(sp.s2d(y), sp.rep_1x1_kernel(w), padding=0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_s2d_matches_flax(rng):
    c, groups = 8, 4
    y = jnp.asarray(rng.randn(2, 12, 16, c).astype(np.float32))
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    want = np.asarray(gn.apply(
        {"params": {"scale": scale, "bias": bias}}, y))
    got = np.asarray(sp.d2s(sp.group_norm_s2d(
        sp.s2d(y), scale, bias, num_groups=groups)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tile_bias_order(rng):
    b = jnp.arange(3.0)
    out = sp.conv2d(sp.s2d(jnp.zeros((1, 4, 4, 3))),
                    sp.rep_1x1_kernel(jnp.zeros((1, 1, 3, 3))), padding=0)
    out = out + sp.tile_bias(b)
    full = np.asarray(sp.d2s(out))
    # every pixel of channel c must carry bias[c]
    for c in range(3):
        assert np.all(full[..., c] == float(c))


def test_fba_tail_fast_matches_slow_with_stitching(rng):
    """The full subpixel FBA tail (incl. GroupNorm stats sharing and the
    stitched border ring) must reproduce the reference-shaped tail
    everywhere — borders included."""
    from tcvom_tpu.models.fba import _fba_tail

    # batch 2 exercises the batched opposite-edge strip chains (each pair
    # of strips runs as one batch-2N slow-path call with per-sample GN)
    h4 = jnp.asarray(rng.randn(2, 16, 24, 256).astype(np.float32))
    skip2 = jnp.asarray(rng.randn(2, 32, 48, 64).astype(np.float32))
    ex_parts = tuple(jnp.asarray(rng.randn(2, 64, 96, c).astype(np.float32))
                     for c in (3, 3, 2))
    p = dict(
        w3=jnp.asarray(rng.randn(3, 3, 320, 64).astype(np.float32)) * 0.1,
        b3=jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1,
        gn_scale=jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
        gn_bias=jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        w40=jnp.asarray(rng.randn(3, 3, 72, 32).astype(np.float32)) * 0.1,
        b40=jnp.asarray(rng.randn(32).astype(np.float32) * 0.1),
        w41=jnp.asarray(rng.randn(3, 3, 32, 16).astype(np.float32)) * 0.1,
        b41=jnp.asarray(rng.randn(16).astype(np.float32) * 0.1),
        w42=jnp.asarray(rng.randn(1, 1, 16, 7).astype(np.float32)) * 0.1,
        b42=jnp.asarray(rng.randn(7).astype(np.float32) * 0.1),
    )
    want = np.asarray(_fba_tail(h4, skip2, ex_parts, p, force_fast=False))
    got = np.asarray(_fba_tail(h4, skip2, ex_parts, p, force_fast=True))
    assert got.shape == want.shape == (2, 64, 96, 7)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fba_tail_pack4_matches_pack16(rng):
    """The 4-pack half-grid tail (honest-FLOP kernels) and the 16-pack
    quarter-grid tail are exact re-associations of the same arithmetic —
    their unpacked outputs must agree to f32 conv reassociation noise."""
    from tcvom_tpu.models.fba import _fba_tail_packed
    from tcvom_tpu.ops import subpixel as sp

    h4 = jnp.asarray(rng.randn(1, 16, 24, 256).astype(np.float32))
    skip2 = jnp.asarray(rng.randn(1, 32, 48, 64).astype(np.float32))
    ex_parts = tuple(jnp.asarray(rng.randn(1, 64, 96, c).astype(np.float32))
                     for c in (3, 3, 2))
    p = dict(
        w3=jnp.asarray(rng.randn(3, 3, 320, 64).astype(np.float32)) * 0.1,
        b3=jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1,
        gn_scale=jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
        gn_bias=jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        w40=jnp.asarray(rng.randn(3, 3, 72, 32).astype(np.float32)) * 0.1,
        b40=jnp.asarray(rng.randn(32).astype(np.float32) * 0.1),
        w41=jnp.asarray(rng.randn(3, 3, 32, 16).astype(np.float32)) * 0.1,
        b41=jnp.asarray(rng.randn(16).astype(np.float32) * 0.1),
        w42=jnp.asarray(rng.randn(1, 1, 16, 7).astype(np.float32)) * 0.1,
        b42=jnp.asarray(rng.randn(7).astype(np.float32) * 0.1),
    )
    e4 = _fba_tail_packed(h4, skip2, ex_parts, p, pack_n=4)
    e16 = _fba_tail_packed(h4, skip2, ex_parts, p, pack_n=16)
    assert e4.shape == (1, 32, 48, 28) and e16.shape == (1, 16, 24, 112)
    np.testing.assert_allclose(
        np.asarray(sp.d2s(e4, prefer_reshape=True)),
        np.asarray(sp.d4s(e16, prefer_reshape=True)), atol=2e-4)


@pytest.mark.parametrize("h4w4", [(24, 16), (16, 16)])
def test_fba_tail_stitching_portrait_and_square(rng, h4w4):
    """Portrait and square grids exercise the border-ring stitching's
    strip extents in both orientations — the fast tail must match the
    reference-shaped tail everywhere, borders included."""
    from tcvom_tpu.models.fba import _fba_tail

    h4s, w4s = h4w4
    h4 = jnp.asarray(rng.randn(1, h4s, w4s, 256).astype(np.float32))
    skip2 = jnp.asarray(rng.randn(1, 2 * h4s, 2 * w4s, 64).astype(np.float32))
    ex_parts = tuple(
        jnp.asarray(rng.randn(1, 4 * h4s, 4 * w4s, c).astype(np.float32))
        for c in (3, 3, 2))
    p = dict(
        w3=jnp.asarray(rng.randn(3, 3, 320, 64).astype(np.float32)) * 0.1,
        b3=jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1,
        gn_scale=jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
        gn_bias=jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        w40=jnp.asarray(rng.randn(3, 3, 72, 32).astype(np.float32)) * 0.1,
        b40=jnp.asarray(rng.randn(32).astype(np.float32) * 0.1),
        w41=jnp.asarray(rng.randn(3, 3, 32, 16).astype(np.float32)) * 0.1,
        b41=jnp.asarray(rng.randn(16).astype(np.float32) * 0.1),
        w42=jnp.asarray(rng.randn(1, 1, 16, 7).astype(np.float32)) * 0.1,
        b42=jnp.asarray(rng.randn(7).astype(np.float32) * 0.1),
    )
    want = np.asarray(_fba_tail(h4, skip2, ex_parts, p, force_fast=False))
    got = np.asarray(_fba_tail(h4, skip2, ex_parts, p, force_fast=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dim_head_fast_matches_slow(rng):
    """DIM's block-packed head (phase-scatter unpool + packed 5x5 convs)
    must match the reference-shaped head exactly — borders included, no
    stitching exists on this path."""
    from tcvom_tpu.models.dim import _dim_head_fast, _dim_head_slow
    from tcvom_tpu.ops.image import max_pool_argmax_2x2

    # realistic per-channel unpool indices from actual poolings
    def idx_for(h, w, c):
        t = jnp.asarray(rng.randn(1, 2 * h, 2 * w, c).astype(np.float32))
        return max_pool_argmax_2x2(t)[1]

    h8, w8 = 8, 12
    x = jnp.asarray(rng.randn(1, h8, w8, 256).astype(np.float32))
    idx3 = idx_for(h8, w8, 256)
    idx2 = idx_for(2 * h8, 2 * w8, 128)
    idx1 = idx_for(4 * h8, 4 * w8, 64)
    p = dict(
        w3=jnp.asarray(rng.randn(5, 5, 256, 128).astype(np.float32)) * 0.05,
        b3=jnp.asarray(rng.randn(128).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(5, 5, 128, 64).astype(np.float32)) * 0.05,
        b2=jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        w1=jnp.asarray(rng.randn(5, 5, 64, 64).astype(np.float32)) * 0.05,
        b1=jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        wa=jnp.asarray(rng.randn(5, 5, 64, 1).astype(np.float32)) * 0.05,
        ba=jnp.asarray(rng.randn(1).astype(np.float32) * 0.1),
    )
    want = np.asarray(_dim_head_slow(x, idx3, idx2, idx1, p))
    got = np.asarray(_dim_head_fast(x, idx3, idx2, idx1, p))
    assert got.shape == want.shape == (1, 8 * h8, 8 * w8, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_index_head_packed_matches_direct(rng, monkeypatch):
    """vmn_index head: the block-packed eval path (phase-broadcast nearest
    upsample + packed 5x5 convs + tiled BN affine) must match the
    reference-shaped path exactly, borders included."""
    from tcvom_tpu.models import registry

    module = registry.build_model("vmn_index", agg_window=3)
    h = w = 64
    x = jnp.asarray(rng.randn(1, 3, h, w, 4).astype(np.float32))
    masks = jnp.asarray((rng.rand(1, 3, h, w, 1) > 0.4).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = module.init({"params": key, "dropout": key}, x, masks,
                            train=False)
    # randomize BN running stats so the affine actually matters
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        variables.get("batch_stats", {}))
    variables = {**variables, "batch_stats": bs}

    want = np.asarray(module.apply(variables, x, masks, train=False)[0])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(module.apply(variables, x, masks, train=False)[0])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stem7_s2_packed_kernel_exact(rng):
    """7x7 stride-2 stem over a packed input must equal the direct conv
    exactly, borders included (zero pads map onto packed zero pads)."""
    x = jnp.asarray(rng.randn(1, 24, 32, 11).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 11, 16).astype(np.float32))
    want = np.asarray(sp.conv2d(x, w, stride=2, padding=3))
    got = np.asarray(sp.conv2d(sp.s2d(x), sp.stem7_s2_packed_kernel(w),
                               padding=[(2, 1), (2, 1)]))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_s2_from_packed_kernel3_exact(rng):
    """3x3 stride-2 conv over a packed input == direct conv, borders incl."""
    x = jnp.asarray(rng.randn(1, 24, 32, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32))
    want = np.asarray(sp.conv2d(x, w, stride=2, padding=1))
    got = np.asarray(sp.conv2d(sp.s2d(x), sp.s2_from_packed_kernel3(w),
                               padding=[(1, 0), (1, 0)]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_s2_packed_out_kernel3_exact(rng):
    """3x3 stride-2 conv, packed input AND packed output."""
    x = jnp.asarray(rng.randn(1, 24, 32, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32))
    want = np.asarray(sp.s2d(sp.conv2d(x, w, stride=2, padding=1)))
    got = np.asarray(sp.conv2d(sp.s2d(x), sp.s2_packed_out_kernel3(w),
                               stride=2, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convT4_packed_out_kernel_exact(rng):
    """ConvTranspose2d(4,2,1) as a 3x3 conv with packed output."""
    from tcvom_tpu.models.layers import conv_transpose_torch
    x = jnp.asarray(rng.randn(1, 12, 16, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 6, 8).astype(np.float32))
    want = np.asarray(sp.s2d(conv_transpose_torch(x, w, 2, 1)))
    got = np.asarray(sp.conv2d(x, sp.convT4_packed_out_kernel(w), padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gca_packed_paths_match_direct(rng, monkeypatch):
    """vmn_gca: the block-packed stem, shortcut heads and decoder tail
    must match the reference-shaped paths exactly (eval)."""
    from tcvom_tpu.models import registry

    module = registry.build_model("vmn_gca", agg_window=3)
    h = w = 64
    x_np = rng.randn(1, 3, h, w, 6).astype(np.float32)
    tri = np.zeros((1, 3, 3, h, w), np.float32)
    tri[:, :, 1, h // 4: h // 2, w // 4: 3 * w // 4] = 1
    tri[:, :, 2, h // 2:, :] = 1
    tri[:, :, 0] = 1 - tri[:, :, 1] - tri[:, :, 2]
    x_np[..., 3:] = np.moveaxis(tri, 2, -1)
    x = jnp.asarray(x_np)
    masks = jnp.asarray(np.moveaxis(tri[:, :, 1:2], 2, -1))
    key = jax.random.PRNGKey(0)
    variables = module.init({"params": key, "dropout": key}, x, masks,
                            train=False)
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        variables.get("batch_stats", {}))
    variables = {**variables, "batch_stats": bs}

    want = np.asarray(module.apply(variables, x, masks, train=False)[0])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # keep FAM on the XLA formulation (the Pallas kernel can't run on the
    # CPU backend this test executes on)
    from tcvom_tpu.ops import fam_pallas
    monkeypatch.setattr(fam_pallas, "_choose_impl", lambda *a: "xla")
    got = np.asarray(module.apply(variables, x, masks, train=False)[0])
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# 16-pack (4x4 block) primitives
# ---------------------------------------------------------------------------

def test_s4d_matches_double_s2d_and_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    got = np.asarray(sp.s4d(x))
    want = np.asarray(sp.s2d(sp.s2d(x)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(sp.d4s(sp.s4d(x))),
                                  np.asarray(x))
    # the forced-reshape path is the same permutation
    np.testing.assert_array_equal(np.asarray(sp.s4d(x, prefer_reshape=True)),
                                  want)
    np.testing.assert_array_equal(
        np.asarray(sp.d4s(sp.s4d(x), prefer_reshape=True)), np.asarray(x))


def test_d4s_flat_matches_d4s_squeeze(rng):
    """d4s_flat == d4s(...)[..., 0] on a single-channel s4d pack — the
    phase gather + flat transpose is the same permutation (u8 matte path,
    tcvom_tpu/infer/predict.py)."""
    x = jnp.asarray(rng.randn(2, 8, 12, 1).astype(np.float32))
    packed = sp.s4d(x, prefer_reshape=True)
    np.testing.assert_array_equal(
        np.asarray(sp.d4s_flat(packed)),
        np.asarray(sp.d4s(packed, prefer_reshape=True))[..., 0])
    u8 = (jnp.abs(packed) * 37).astype(jnp.uint8)
    np.testing.assert_array_equal(
        np.asarray(sp.d4s_flat(u8)),
        np.asarray(sp.d4s(u8.astype(jnp.float32),
                          prefer_reshape=True))[..., 0].astype(np.uint8))


def test_rep16_conv_kernel_exact_everywhere(rng):
    x = jnp.asarray(rng.randn(1, 12, 16, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    want = np.asarray(_conv3x3(x, w))
    got = np.asarray(sp.d4s(sp.conv2d(sp.s4d(x), sp.rep16_conv_kernel(w),
                                      padding=1)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_up_conv_16_kernel_matches_reference_interior(rng):
    h2 = jnp.asarray(rng.randn(1, 8, 12, 5).astype(np.float32))   # OS=2
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    want = np.asarray(_conv3x3(_up2x(h2), w))                     # OS=1
    got = np.asarray(sp.d4s(sp.conv2d(sp.s2d(h2), sp.up_conv_16_kernel(w),
                                      padding=1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:, 4:-4, 4:-4], want[:, 4:-4, 4:-4],
                               atol=1e-5)


def test_rep16_1x1_kernel_exact(rng):
    x = jnp.asarray(rng.randn(1, 8, 12, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 5, 7).astype(np.float32))
    want = np.asarray(sp.conv2d(x, w))
    got = np.asarray(sp.d4s(sp.conv2d(sp.s4d(x), sp.rep16_1x1_kernel(w))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_s4d_parts_kernel_row_perm(rng):
    """Part-major packing + kernel row permutation == s4d of the concat."""
    a = jnp.asarray(rng.randn(1, 12, 16, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 12, 16, 3).astype(np.float32))
    c = jnp.asarray(rng.randn(1, 12, 16, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    full = jnp.concatenate([a, b, c], axis=-1)
    want = np.asarray(sp.conv2d(sp.s4d(full), sp.rep16_conv_kernel(w),
                                padding=1))
    packed, row_perm = sp.s4d_parts([a, b, c])
    k = jnp.take(sp.rep16_conv_kernel(w), jnp.asarray(row_perm), axis=2)
    got = np.asarray(sp.conv2d(packed, k, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tile_bias16_order(rng):
    x = jnp.asarray(rng.randn(1, 8, 12, 5).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    want = np.asarray(x + bias)
    got = np.asarray(sp.d4s(sp.s4d(x) + sp.tile_bias16(bias)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fba_decoder_packed_fusion_matches_fullres(rng, monkeypatch):
    """The packed-space fusion solve (clip/sigmoid/fba_fusion on the
    16-pack quarter grid, then per-output unpacks) must equal the
    reference-shaped path's full-resolution solve everywhere — fusion is
    pointwise and s4d/d4s are pure per-pixel permutations, so the only
    tolerated difference is f32 conv reassociation upstream."""
    from tcvom_tpu.models import registry

    module = registry.build_model("fba")
    h, w = 64, 96
    x = jnp.asarray(rng.randn(1, h, w, 11).astype(np.float32))
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    two = jnp.asarray((rng.rand(1, h, w, 2) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = module.init({"params": key, "dropout": key}, x,
                            extras=(img, two), train=False)

    want = np.asarray(module.apply(variables, x, extras=(img, two),
                                   train=False))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(module.apply(variables, x, extras=(img, two),
                                  train=False))
    assert got.shape == want.shape == (1, h, w, 7)
    np.testing.assert_allclose(got, want, atol=5e-4)
