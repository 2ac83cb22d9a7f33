"""Smoke tests: init + forward every backbone and VMN variant on tiny
inputs; check shapes, finiteness, and the full loss stacks. Everything is
jitted — eager dispatch of these graphs is pathologically slow on CPU."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tcvom_tpu.models import full_model as FM
from tcvom_tpu.models import registry

H = W = 64


def _batch(rng, b=1, s=3, h=H, w=W):
    return {
        "a": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 1)).astype(np.float32)),
        "fg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)).astype(np.float32)),
        "bg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)).astype(np.float32)),
    }


def _init_single(name):
    cfg = FM.TaskConfig(model=name)
    module = registry.build_model(name)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, 3 + cfg.trimap_channels))
    extras = None
    if cfg.method == "fba":
        extras = (jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 2)))
    variables = jax.jit(
        lambda: module.init({"params": key, "dropout": key}, x, extras=extras,
                            train=False))()
    return cfg, module, variables


@pytest.mark.parametrize("name", ["dim", "index", "gca", "fba"])
def test_single_frame_models(name, rng):
    cfg, module, variables = _init_single(name)

    @jax.jit
    def run(variables, key, batch):
        losses, aux, _ = FM.forward_single(module, variables, key, batch, cfg,
                                           train=False)
        return losses, aux["alphas"]

    losses, alphas = run(variables, jax.random.PRNGKey(1), _batch(rng))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (name, k)
    assert alphas.shape[:2] == (1, 3)


@pytest.mark.parametrize("name", ["vmn_dim", "vmn_index", "vmn_gca", "vmn_fba"])
def test_vmn_models(name, rng):
    cfg = FM.TaskConfig(model=name, agg_window=3)
    module = registry.build_model(name, agg_window=3)
    key = jax.random.PRNGKey(0)
    s = 3
    x = jnp.zeros((1, s, H, W, 3 + cfg.trimap_channels))
    masks = jnp.ones((1, s, H, W, 1))
    extras = None
    if cfg.method == "fba":
        extras = (jnp.zeros((1, s, H, W, 3)), jnp.zeros((1, s, H, W, 2)))
    variables = jax.jit(
        lambda: module.init({"params": key, "dropout": key}, x, masks,
                            extras=extras, train=False))()

    @jax.jit
    def run(variables, key, batch):
        losses, aux, _ = FM.forward_vmd(module, variables, key, batch, cfg,
                                        train=False)
        return losses, aux["alphas"]

    losses, alphas = run(variables, jax.random.PRNGKey(1), _batch(rng, s=s))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (name, k)
    assert alphas.shape == (1, s, H, W, 1)


def test_eval_model_pastes_trimap(rng):
    cfg, module, variables = _init_single("dim")
    imgs = jnp.asarray(rng.randint(0, 256, (1, 3, H, W, 3)).astype(np.float32))
    tri = np.zeros((1, 3, H, W, 1), np.float32)
    tri[:, :, 20:40, 20:40] = 128.0
    tri[:, :, 25:35, 25:35] = 255.0

    run = jax.jit(lambda v, i, t: FM.forward_eval(module, v, i, t, cfg))
    alphas = run(variables, imgs, jnp.asarray(tri))
    out = np.asarray(alphas)[0, 1]
    # outside unknown region, gt trimap values are pasted through
    assert np.allclose(out[tri[0, 1, ..., 0] == 255.0], 1.0)
    assert np.allclose(out[tri[0, 1, ..., 0] == 0.0], 0.0)


def test_vmn_freeze_backbone_stops_gradients(rng):
    name = "vmn_dim"
    cfg = FM.TaskConfig(model=name, agg_window=3, freeze_backbone=True)
    module = registry.build_model(name, agg_window=3, freeze_backbone=True)
    key = jax.random.PRNGKey(0)
    s = 3
    x = jnp.zeros((1, s, H, W, 4))
    masks = jnp.ones((1, s, H, W, 1))
    variables = jax.jit(
        lambda: module.init({"params": key, "dropout": key}, x, masks,
                            train=False))()
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    batch = _batch(rng, s=s)

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            losses, _, _ = FM.forward_vmd(module, {"params": p, **state},
                                          jax.random.PRNGKey(1), batch, cfg,
                                          train=True)
            return sum(jnp.asarray(v) for v in losses.values())
        return jax.grad(loss_fn)(p)

    grads = grad_fn(params)
    enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree.leaves(grads["encoder"]))
    fam_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree.leaves(grads["fam"]))
    assert enc_norm == 0.0
    assert fam_norm > 0.0
