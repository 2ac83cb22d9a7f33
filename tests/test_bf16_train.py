"""Mixed-precision training recipe (MattingTrainer compute_dtype).

The production TRAIN.BF16 path: f32 master weights/optimizer/EMA, bf16
params+activations inside the step. These are structural checks (dtypes,
finiteness, gradient agreement at init); the numerics gates live in
tools/validate_bf16_train.py -> BF16_TRAIN_GUARD.json (run on chip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcvom_tpu.models.full_model import TaskConfig
from tcvom_tpu.train.trainer import MattingTrainer


def make_batch(rng, b=1, s=3, h=32, w=32):
    a = np.zeros((b, s, h, w, 1), np.float32)
    a[:, :, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = \
        rng.rand(b, s, h // 2, w // 2, 1) * 255.0
    return {"a": jnp.asarray(a),
            "fg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)),
                              jnp.float32),
            "bg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)),
                              jnp.float32)}


@pytest.mark.parametrize("model", ["vmn_dim"])
def test_bf16_train_step_keeps_f32_master_state(model):
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    tr = MattingTrainer(TaskConfig(model=model, agg_window=3), "vmd",
                        compute_dtype=jnp.bfloat16)
    state = tr.init_state(key, batch)
    before = jax.tree.map(np.asarray, state.params)   # train_step donates
    new_state, metrics = tr.train_step(state, batch, key)

    # master params, optimizer moments and BN/EMA stats stay f32
    for leaf in jax.tree.leaves(new_state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(new_state.model_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, "EMA stats must stay f32"
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = any(
        float(np.max(np.abs(np.asarray(a) - b))) > 0
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(before)))
    assert moved


def test_bf16_gradients_point_like_f32():
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    tr32 = MattingTrainer(TaskConfig(model="vmn_dim", agg_window=3), "vmd")
    tr16 = MattingTrainer(TaskConfig(model="vmn_dim", agg_window=3), "vmd",
                          compute_dtype=jnp.bfloat16)
    state = tr32.init_state(key, batch)
    tr16.init_state(key, batch)       # builds its optimizer

    def grads(tr):
        def loss_fn(p):
            variables = {"params": tr._cast_compute(p),
                         **tr._cast_compute(state.model_state)}
            losses, _, _ = tr._forward(
                tr.module, variables, key, tr._cast_compute(batch), tr.cfg,
                train=True, mutable=list(state.model_state.keys()) or False)
            return sum(tr.loss_weights[k] * v for k, v in losses.items())
        return jax.grad(loss_fn)(state.params)

    g32, g16 = grads(tr32), grads(tr16)
    f32 = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(g32)])
    f16 = jnp.concatenate([x.astype(jnp.float32).reshape(-1)
                           for x in jax.tree.leaves(g16)])
    # bf16 grads are f32 (cast VJP) and point the same way
    assert f16.dtype == jnp.float32
    cos = float(jnp.vdot(f32, f16)
                / (jnp.linalg.norm(f32) * jnp.linalg.norm(f16) + 1e-12))
    assert cos > 0.98, cos
