"""End-to-end CLI smoke: synthetic dataset -> 2 train steps -> val-sweep
inference -> metric.json, exercising the full tool chain in-process
(the reference's validate-during-training integration test, SURVEY §4)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1",
           PYTHONPATH=REPO)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vmd108"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_dataset
    # tiny frames: /32-compatible 96x160
    make_fake_dataset.make(root, frames=5, hw=(96, 160))
    return root


@pytest.mark.slow
def test_dataset_loads(fake_root):
    from tcvom_tpu.data.vmd import VideoMattingDataset
    ds = VideoMattingDataset(fake_root, image_shape=(64, 64), mode="train",
                             no_flow=True, sample_length=3)
    item = ds[0]
    assert item["a"].shape == (3, 64, 64, 1)
    assert item["fg"].shape == (3, 64, 64, 3)
    # val path with flow
    dsv = VideoMattingDataset(fake_root, image_shape=(96, 160), mode="val",
                              no_flow=False, sample_length=5,
                              precomputed_val=fake_root)
    item = dsv[1]
    assert item["wb"].shape == (5, 96, 160, 2)


@pytest.mark.slow
def test_train_pred_metric_roundtrip(fake_root, tmp_path):
    outdir = str(tmp_path / "run")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
MODEL: 'vmn_dim'
AGG_WINDOW: 3
SYSTEM:
  NUM_WORKERS: 2
  RANDOM_SEED: 7
  OUTDIR: '{outdir}'
DATASET:
  PATH: '{fake_root}'
TRAIN:
  BATCH_SIZE_PER_GPU: 1
  BASE_LR: 1e-4
  TRAIN_INPUT_SIZE: [64, 64]
  VAL_INPUT_SIZE: [64, 64]
  TOTAL_STEPS: 1
  PRINT_FREQ: 1
  IMAGE_FREQ: 1000
""")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", str(cfg), "--sample_length", "3"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = [d for d in os.listdir(os.path.join(outdir, "cfg"))
             if d.startswith("checkpoint_")]
    assert ckpts, os.listdir(os.path.join(outdir, "cfg"))

    # val-sweep inference at the native fake resolution
    save = str(tmp_path / "pred")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pred_vmn.py"),
         "--model", "dim", "--data", fake_root,
         "--load", os.path.join(outdir, "cfg", ckpts[0]),
         "--trimap", "medium", "--save", save, "--agg_window", "3",
         "--batch", "1", "--image_shape", "96", "160"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    preds = [f for f in os.listdir(os.path.join(save, "clip_b"))
             if f.endswith("_pred.png")]
    assert len(preds) == 5, preds

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "calc_metric.py"),
         "--pred", save, "--data", fake_root, "--n_threads", "2"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(save, "metric.json")) as f:
        metrics = json.load(f)
    for k in ("mSAD", "MSE", "SSDA", "dtSSD", "MESSDdt"):
        assert np.isfinite(metrics["avg"][k]), metrics["avg"]

    # same sweep over a 4-device CPU mesh with a ragged batch (3 % 4 != 0):
    # the GSPMD data-parallel path of pred_vmn (pad_shard_batch) must write
    # the same mattes as the single-device run
    import cv2
    save4 = str(tmp_path / "pred4")
    env4 = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pred_vmn.py"),
         "--model", "dim", "--data", fake_root,
         "--load", os.path.join(outdir, "cfg", ckpts[0]),
         "--trimap", "medium", "--save", save4, "--agg_window", "3",
         "--batch", "3", "--image_shape", "96", "160"],
        env=env4, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    for f in preds:
        a1 = cv2.imread(os.path.join(save, "clip_b", f), cv2.IMREAD_GRAYSCALE)
        a4 = cv2.imread(os.path.join(save4, "clip_b", f), cv2.IMREAD_GRAYSCALE)
        assert a4 is not None, f
        # identical up to 1 uint8 step (reduction-order noise at the
        # quantization boundary)
        assert np.abs(a1.astype(int) - a4.astype(int)).max() <= 1, f


@pytest.mark.slow
def test_pred_single_adobe(tmp_path):
    """Adobe still-image eval path (reference pred_single.py:146-166):
    synthetic Adobe tree -> random-init ckpt -> pred_single --dataset adobe
    writes per-sample-cropped preds. Regression for the r1 sample_length
    AttributeError and the shared-crop bug."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_dataset
    root = str(tmp_path / "adobe")
    make_fake_dataset.make_adobe(root, n=2, hw=(80, 56))

    # random-init checkpoint via the trainer's own save path
    import jax
    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer
    from tcvom_tpu.utils.checkpoint import save_checkpoint
    import jax.numpy as jnp
    trainer = MattingTrainer(TaskConfig(model="dim"), "single")
    init_batch = {k: jnp.zeros((1, 3, 64, 64, c), jnp.float32)
                  for k, c in (("a", 1), ("fg", 3), ("bg", 3))}
    state = trainer.init_state(jax.random.PRNGKey(0), init_batch)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": state.params,
                           "model_state": state.model_state})

    save = str(tmp_path / "adobe_pred")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pred_single.py"),
         "--model", "dim", "--data", root, "--load", ckpt,
         "--trimap", "medium", "--save", save, "--dataset", "adobe",
         "--val_mode", "resize", "--min_shape", "64", "--batch", "2",
         "--n_threads", "1"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    import cv2
    for i, og in enumerate([(80, 56), (88, 60)]):
        pred = cv2.imread(os.path.join(save, f"{i:05d}_pred.png"),
                          cv2.IMREAD_GRAYSCALE)
        assert pred is not None
        # grid is 64x64; crop is min(og, grid) per sample
        assert pred.shape == (min(og[0], 64), min(og[1], 64)), \
            (i, pred.shape)


def test_pred_test_wild_folders(tmp_path):
    """Wild-video inference from real trimaps (reference pred_test.py):
    a root of per-video folders of NNNNN_rgb.png / NNNNN_trimap.png at a
    non-/32 size -> pred_test with a positional video selection and
    --dilation writes save/<video>/NNNNN_alpha.png at the original size."""
    import cv2
    rng = np.random.RandomState(0)
    h, w = 70, 90                       # forces the pad-to-32 path
    root = tmp_path / "wild"
    for v in ("clipA", "clipB"):
        d = root / v
        os.makedirs(d)
        for i in range(3):
            cv2.imwrite(str(d / f"{i:05d}_rgb.png"),
                        rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
            tri = np.zeros((h, w), np.uint8)
            tri[20:50, 30:70] = 128
            tri[30:40, 40:60] = 255
            cv2.imwrite(str(d / f"{i:05d}_trimap.png"), tri)

    import jax
    import jax.numpy as jnp
    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer
    from tcvom_tpu.utils.checkpoint import save_checkpoint
    trainer = MattingTrainer(TaskConfig(model="vmn_dim", agg_window=3),
                             "vmd")
    init_batch = {k: jnp.zeros((1, 3, 64, 64, c), jnp.float32)
                  for k, c in (("a", 1), ("fg", 3), ("bg", 3))}
    state = trainer.init_state(jax.random.PRNGKey(0), init_batch)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": state.params,
                           "model_state": state.model_state})

    save = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pred_test.py"),
         "--model", "dim", "--vmn", "--load", ckpt, "--data", str(root),
         "--save", save, "--agg_window", "3", "--dilation", "3", "clipA"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    for i in range(3):
        a = cv2.imread(os.path.join(save, "clipA", f"{i:05d}_alpha.png"),
                       cv2.IMREAD_GRAYSCALE)
        assert a is not None and a.shape == (h, w), (i, None if a is None
                                                     else a.shape)
    # the positional selection must exclude clipB
    assert not os.path.exists(os.path.join(save, "clipB"))

    # --shard I/N static range sharding (reference pred_test.py:124-137):
    # shard 1/2 of [clipA, clipB] is exactly clipB
    save2 = str(tmp_path / "out_shard")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pred_test.py"),
         "--model", "dim", "--vmn", "--load", ckpt, "--data", str(root),
         "--save", save2, "--agg_window", "3", "--shard", "1/2"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(save2, "clipB", "00000_alpha.png"))
    assert not os.path.exists(os.path.join(save2, "clipA"))


@pytest.mark.slow
def test_pretrain_dim_e2e(tmp_path):
    """TAM-pretrain driver end-to-end on synthetic Adobe stills (reference
    pretrain_ddp.py): --driver single --dataset dim --eps 0.01 with a VMN
    model + FREEZE_BACKBONE, covering synth_frames3's random-affine branch,
    the eps alpha snap, and the frozen-backbone optimizer mask in one run."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_dataset
    root = str(tmp_path / "adobe")
    make_fake_dataset.make_adobe(root, n=2, hw=(80, 56))

    outdir = str(tmp_path / "run")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
MODEL: 'vmn_dim'
AGG_WINDOW: 3
SYSTEM:
  NUM_WORKERS: 2
  RANDOM_SEED: 3
  OUTDIR: '{outdir}'
DATASET:
  PATH: '{root}'
TRAIN:
  BATCH_SIZE_PER_GPU: 1
  BASE_LR: 1e-4
  FREEZE_BACKBONE: true
  MIN_EDGE_LENGTH: 64
  TRAIN_INPUT_SIZE: [64, 64]
  VAL_INPUT_SIZE: [64, 64]
  TOTAL_STEPS: 1
  PRINT_FREQ: 1
  IMAGE_FREQ: 1000
""")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--cfg", str(cfg), "--driver", "single", "--dataset", "dim",
         "--eps", "0.01"],
        env=ENV, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(outdir, "cfg", "checkpoint_1"))
