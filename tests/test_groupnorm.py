"""GroupNorm moment restructure: parity with flax nn.GroupNorm.

_GroupNorm computes per-channel sums (lane dim kept — the fast reduce
on TPU, see its docstring) and folds [C] -> [G] afterwards; this pins
that the result still equals the canonical GroupNorm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("shape,dtype", [
    ((2, 12, 16, 64), jnp.float32),
    ((1, 8, 24, 256), jnp.float32),
    ((1, 8, 16, 128), jnp.bfloat16),
])
def test_group_norm_matches_flax(shape, dtype):
    from flax import linen as nn
    from tcvom_tpu.models.layers import GroupNorm32
    x = jnp.asarray(np.random.RandomState(2).randn(*shape), dtype)
    mod = GroupNorm32()
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = np.asarray(mod.apply(v, x), np.float32)
    yr = np.asarray(ref.apply(v, x), np.float32)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(y, yr, rtol=tol, atol=tol)


def test_group_norm_grad_matches_flax():
    from flax import linen as nn
    from tcvom_tpu.models.layers import GroupNorm32
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 64), jnp.float32)
    mod = GroupNorm32()
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    v = mod.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda x: jnp.sum(jnp.sin(mod.apply(v, x))))(x)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(ref.apply(v, x))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)
