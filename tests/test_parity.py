"""Activation parity: converted reference-torch weights must reproduce the
reference models' outputs through our flax models (eval mode).

This is the checkpoint-conversion regression oracle (SURVEY.md §7 step 4):
we instantiate the ORIGINAL reference models (mounted read-only) with
random init, convert their state_dicts with tcvom_tpu.utils.convert, and
diff outputs on random inputs.
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tcvom_tpu.models import registry
from tcvom_tpu.utils.convert import convert_state_dict, merge_variables

H = W = 64


def _to_nhwc(t):
    return jnp.asarray(np.moveaxis(t.detach().numpy(), 1, -1))


def _run_flax(name, sd, inputs_nhwc, extras=None):
    module = registry.build_model(name)
    variables, unmatched = convert_state_dict(name, sd)
    assert not unmatched, f"unconverted torch keys: {unmatched[:8]}"
    # init to get the full structure (spectral u/v etc.), then overlay
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, inputs_nhwc, extras=extras,
        train=False))()
    merged, missing, unexpected = merge_variables(init_vars, variables)
    assert not unexpected, f"unexpected: {unexpected[:8]}"
    # missing is allowed only for spectral u/v defaults that torch also has;
    # here everything should be covered
    assert not missing, f"missing: {missing[:8]}"
    fwd = jax.jit(lambda v, x: module.apply(v, x, extras=extras, train=False))
    return fwd(merged, inputs_nhwc)


@pytest.mark.slow
def test_dim_parity(rng):
    from models.DIM.vggnet import DIM_VGG
    torch.manual_seed(0)
    m = DIM_VGG().eval()
    x = torch.from_numpy(rng.randn(1, 4, H, W).astype(np.float32))
    with torch.no_grad():
        want = m(x).numpy()
    got = _run_flax("dim", m.state_dict(), _to_nhwc(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4)


@pytest.mark.slow
def test_index_parity(rng):
    from models.Index.net import IndexMatting
    torch.manual_seed(0)
    m = IndexMatting().eval()
    x = torch.from_numpy(rng.randn(1, 4, H, W).astype(np.float32))
    with torch.no_grad():
        want = m(x).numpy()
    got = _run_flax("index", m.state_dict(), _to_nhwc(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4)


@pytest.mark.slow
def test_gca_parity(rng):
    from models.GCA.generators import GCA
    torch.manual_seed(0)
    m = GCA().eval()
    x_np = rng.randn(1, 6, H, W).astype(np.float32)
    # make the trimap channels a plausible one-hot so the unknown mask and
    # softmax scales are well-defined
    tri = np.zeros((1, 3, H, W), np.float32)
    tri[0, 1, 20:40, 20:44] = 1
    tri[0, 2, 40:, :] = 1
    tri[0, 0] = 1 - tri[0, 1] - tri[0, 2]
    x_np[:, 3:] = tri
    x = torch.from_numpy(x_np)
    with torch.no_grad():
        want = m(x).numpy()
    got = _run_flax("gca", m.state_dict(), _to_nhwc(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=5e-4)


@pytest.mark.slow
def test_fba_parity(rng):
    from models.FBA.models import FBA
    torch.manual_seed(0)
    m = FBA().eval()
    x = torch.from_numpy(rng.randn(1, 11, H, W).astype(np.float32))
    img = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))
    two = torch.from_numpy((rng.rand(1, 2, H, W) > 0.5).astype(np.float32))
    with torch.no_grad():
        want = m(x, extras=[img, two]).numpy()
    got = _run_flax("fba", m.state_dict(), _to_nhwc(x),
                    extras=(_to_nhwc(img), _to_nhwc(two)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=5e-4)
