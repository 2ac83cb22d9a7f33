"""Optimizer-resume (TRAIN.LOAD_OPT) coverage — the reference resumes the
full optimizer state + start epoch from the checkpoint (train_ddp.py:300-304).

Two tiers:
- unit: a resumed TrainState is structurally identical to a fresh one and
  continues training bit-exactly (2 steps + save/restore + 1 step ==
  3 uninterrupted steps under the same rng/batch sequence);
- e2e: tools/train.py resumes from checkpoint_1 at epoch 1 and finishes.
"""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1",
           PYTHONPATH=REPO)


def _tiny_trainer(total_iters=10):
    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer
    # poly LR + masked adam: the most structured optimizer state we build
    return MattingTrainer(TaskConfig(model="vmn_dim", agg_window=3,
                                     freeze_backbone=True),
                          "single", optimizer="adam", lr_strategy="poly",
                          base_lr=1e-3, total_iters=total_iters)


def _batch(key):
    import jax
    import jax.numpy as jnp
    ka, kf, kb = jax.random.split(key, 3)
    return {"a": jax.random.uniform(ka, (1, 3, 32, 32, 1)),
            "fg": jax.random.uniform(kf, (1, 3, 32, 32, 3)),
            "bg": jax.random.uniform(kb, (1, 3, 32, 32, 3))}


def test_restore_train_state_roundtrip(tmp_path):
    import jax
    from tcvom_tpu.utils.checkpoint import restore_train_state, save_checkpoint

    trainer = _tiny_trainer()
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, _batch(key))

    # uninterrupted run: 3 steps with a fixed rng/batch schedule
    # (train_step donates its input state, so copy per run)
    import jax.numpy as jnp
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]
    batches = [_batch(jax.random.PRNGKey(200 + i)) for i in range(3)]
    s_ref = jax.tree.map(jnp.copy, state)
    for r, b in zip(rngs, batches):
        s_ref, _ = trainer.train_step(s_ref, b, r)

    # interrupted run: 2 steps, save, restore into a FRESH state, 1 step
    s_a = jax.tree.map(jnp.copy, state)
    for r, b in zip(rngs[:2], batches[:2]):
        s_a, _ = trainer.train_step(s_a, b, r)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"step": s_a.step, "params": s_a.params,
                           "model_state": s_a.model_state,
                           "opt_state": s_a.opt_state})

    trainer2 = _tiny_trainer()
    fresh = trainer2.init_state(jax.random.PRNGKey(1), _batch(key))
    resumed = restore_train_state(ckpt, fresh)

    # exact structural identity with a never-checkpointed state
    assert (jax.tree.structure(resumed) == jax.tree.structure(s_ref)), \
        "resumed TrainState structure diverged"
    assert int(resumed.step) == 2

    s_b, metrics = trainer2.train_step(resumed, batches[2], rngs[2])
    assert int(s_b.step) == 3
    # LR schedule position continued (poly schedule at step 2, not 0)
    np.testing.assert_allclose(float(metrics["lr"]),
                               float(trainer.lr_schedule(2)), rtol=1e-6)
    # bit-exact continuation: params and optimizer moments all match
    for la, lb in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_restore_train_state_rejects_mismatch(tmp_path):
    """A checkpoint from a different model/optimizer config must fail
    loudly, not silently mis-merge."""
    import jax
    from tcvom_tpu.utils.checkpoint import restore_train_state, save_checkpoint

    trainer = _tiny_trainer()
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, _batch(key))
    ckpt = str(tmp_path / "ckpt")
    # weights-only dump (what save_checkpoint writes for 'best')
    save_checkpoint(ckpt, {"step": state.step, "params": state.params,
                           "model_state": state.model_state})
    with pytest.raises(Exception):
        restore_train_state(ckpt, state)


@pytest.mark.slow
def test_train_resume_e2e(tmp_path):
    """tools/train.py TRAIN.LOAD_OPT end-to-end: 1-epoch run -> resume with
    TOTAL_STEPS=2 runs exactly epoch 1 and saves checkpoint_2."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_dataset
    root = str(tmp_path / "vmd108")
    make_fake_dataset.make(root, frames=5, hw=(96, 160))

    outdir = str(tmp_path / "run")
    cfg = tmp_path / "cfg.yaml"
    cfg_text = f"""
MODEL: 'vmn_dim'
AGG_WINDOW: 3
SYSTEM:
  NUM_WORKERS: 2
  RANDOM_SEED: 7
  OUTDIR: '{outdir}'
DATASET:
  PATH: '{root}'
TRAIN:
  BATCH_SIZE_PER_GPU: 1
  BASE_LR: 1e-4
  TRAIN_INPUT_SIZE: [64, 64]
  VAL_INPUT_SIZE: [64, 64]
  TOTAL_STEPS: 1
  PRINT_FREQ: 1
  IMAGE_FREQ: 1000
"""
    cfg.write_text(cfg_text)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", str(cfg), "--sample_length", "3"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt1 = os.path.join(outdir, "cfg", "checkpoint_1")
    assert os.path.exists(ckpt1)

    cfg.write_text(cfg_text.replace("TOTAL_STEPS: 1", "TOTAL_STEPS: 2")
                   + f"  LOAD_OPT: '{ckpt1}'\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", str(cfg), "--sample_length", "3"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(outdir, "cfg", "checkpoint_2"))

    log = [f for f in os.listdir(os.path.join(outdir, "cfg"))
           if f.endswith(".log")]
    text = ""
    for f in log:
        with open(os.path.join(outdir, "cfg", f)) as fh:
            text += fh.read()
    m = re.search(r"resumed full train state from .* \(step (\d+), epoch (\d+)\)",
                  text)
    assert m, "resume log line missing"
    steps_per_epoch = int(m.group(1))
    assert int(m.group(2)) == 1
    # the resumed run's first logged iteration starts at epoch 1
    iters = [int(x) for x in re.findall(r"Iter:\[(\d+)/", text)]
    assert max(iters) >= steps_per_epoch, iters
