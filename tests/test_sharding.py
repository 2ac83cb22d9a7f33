"""Multi-device tests on the virtual 8-CPU mesh: data-parallel training
(gradient all-reduce + BN sync via GSPMD) and spatially-sharded inference
(H axis over the 'space' mesh dim — conv halos inserted by the compiler)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tcvom_tpu.models import full_model as FM
from tcvom_tpu.models import registry
from tcvom_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from tcvom_tpu.train.trainer import MattingTrainer

H = W = 32


def _batch(rng, b, s=3, h=H, w=W):
    return {
        "a": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 1)).astype(np.float32)),
        "fg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)).astype(np.float32)),
        "bg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)).astype(np.float32)),
    }


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_data_parallel_train_step_matches_single_device(rng):
    # NOTE: 4-way (not 8) — this host has ONE physical core, and XLA:CPU
    # collectives abort if all participants can't join a rendezvous within
    # 40s; fewer participants keeps the check robust under load.
    cfg = FM.TaskConfig(model="vmn_dim", agg_window=3)
    # sgd: updates are proportional to gradients, so reduction-order noise
    # stays ~1e-6 (adam's grad/sqrt(v) normalization amplifies it on
    # near-zero gradients)
    trainer = MattingTrainer(cfg, "vmd", optimizer="sgd",
                             lr_strategy="const", base_lr=1e-3)
    batch = _batch(rng, b=4)
    # two independent (identical) states — train_step donates its input,
    # and device_put aliases buffers when the sharding already matches
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)),
                              trainer.init_state(jax.random.PRNGKey(0), batch))

    mesh = make_mesh(jax.devices()[:4])
    state8 = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state_copy)
    dev_batch = shard_batch(batch, mesh)

    # single-device step
    s1, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))

    # 8-way data parallel step on the same global batch
    s8, m8 = trainer.train_step(state8, dev_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # parameters after one step agree (DDP equivalence: same global batch)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_spatially_sharded_inference_matches(rng):
    """Shard the H axis over 'space' — the 2D-context-parallel analog for
    1080p activations (SURVEY §2 parallelism extension)."""
    cfg = FM.TaskConfig(model="vmn_dim", agg_window=3)
    module = registry.build_model("vmn_dim", agg_window=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, H, W, 4))
    masks = jnp.ones((1, 3, H, W, 1))
    variables = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, masks, train=False))()

    imgs = jnp.asarray(rng.randint(0, 256, (2, 3, H, W, 3)).astype(np.float32))
    tri = np.zeros((2, 3, H, W, 1), np.float32)
    tri[:, :, 8:24, 6:28] = 128.0
    tri[:, :, 12:20, 10:24] = 255.0
    tri = jnp.asarray(tri)

    run = jax.jit(lambda v, i, t: FM.forward_eval(module, v, i, t, cfg))
    want = np.asarray(run(variables, imgs, tri))

    mesh = make_mesh(jax.devices()[:4], space=2)   # 2 data x 2 space
    sh = batch_sharding(mesh, 5, space_axis=2)
    vars_r = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), variables)
    got = np.asarray(run(vars_r, jax.device_put(imgs, sh),
                         jax.device_put(tri, sh)))
    np.testing.assert_allclose(got, want, atol=1e-4)

@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_vmd_eval_step_matches_single_device(rng):
    """pred_vmn's jitted eval step over a 4-way data mesh (replicated
    params + dim-0-sharded batch, incl. the pad_shard_batch ragged-tail
    path) must reproduce the single-device outputs — the GSPMD equivalent
    of the reference's nn.DataParallel inference (pred_vmn.py:85)."""
    from tcvom_tpu.infer.predict import make_vmd_eval_step
    from tcvom_tpu.parallel.mesh import pad_shard_batch, replicate

    cfg = FM.TaskConfig(model="vmn_dim", agg_window=3)
    module = registry.build_model("vmn_dim", agg_window=3)
    trainer = MattingTrainer(cfg, "vmd")
    batch = _batch(rng, b=3)           # 3 % 4 != 0: exercises padding
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = make_vmd_eval_step(module, cfg)
    key = jax.random.PRNGKey(1)

    losses1, alphas1, tris1 = step(state.variables, batch, key)

    mesh = make_mesh(jax.devices()[:4])
    vars_r = replicate(state.variables, mesh)
    dev_batch, b = pad_shard_batch(
        jax.tree.map(np.asarray, batch), mesh)
    assert b == 3
    assert next(iter(jax.tree.leaves(dev_batch))).shape[0] == 4
    losses4, alphas4, tris4 = step(vars_r, dev_batch, key)

    np.testing.assert_allclose(np.asarray(alphas4)[:b], np.asarray(alphas1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tris4)[:b], np.asarray(tris1),
                               atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_pad_shard_batch_space_axis(rng):
    """2 data x 2 space mesh: the eval step over a batch whose H axis is
    co-sharded over 'space' must match single-device outputs — the
    single-stream multi-chip scaling mode of pred_vmn (--space)."""
    from tcvom_tpu.infer.predict import make_vmd_eval_step
    from tcvom_tpu.parallel.mesh import pad_shard_batch, replicate

    cfg = FM.TaskConfig(model="vmn_dim", agg_window=3)
    module = registry.build_model("vmn_dim", agg_window=3)
    trainer = MattingTrainer(cfg, "vmd")
    batch = _batch(rng, b=2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = make_vmd_eval_step(module, cfg)
    key = jax.random.PRNGKey(1)

    _, alphas1, tris1 = step(state.variables, batch, key)

    mesh = make_mesh(jax.devices()[:4], space=2)
    vars_r = replicate(state.variables, mesh)
    dev_batch, b = pad_shard_batch(jax.tree.map(np.asarray, batch), mesh,
                                   space_axis=2)
    _, alphas4, tris4 = step(vars_r, dev_batch, key)
    np.testing.assert_allclose(np.asarray(alphas4)[:b], np.asarray(alphas1),
                               atol=1e-4)
