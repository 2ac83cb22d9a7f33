"""Two-process jax.distributed training smoke (CPU backend).

The reference's env:// DDP rendezvous supported multi-node training
(train_ddp.py:202-204). The TPU-native analog is one controller process
per host + jax.distributed.initialize + GSPMD over the global mesh, with
the loader strided by process_index. This test actually EXECUTES that
path: two coordinated processes (2 virtual CPU devices each) run one
epoch of tools/train.py and the per-step loss must match a single-process
run (4 devices) consuming the same global batch — the per-sample dataset
RNG makes augmentation draws process-count-invariant, and the loss is a
global-batch mean, so only reduction order may differ.
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = """
MODEL: 'vmn_dim'
AGG_WINDOW: 3
SYSTEM:
  NUM_WORKERS: 1
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

LOSS_RE = re.compile(r"Current: Loss: ([0-9.]+)")


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vmd108_mh"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_dataset
    make_fake_dataset.make(root, frames=5, hw=(96, 160))
    return root


def _env(n_local, extra=None):
    e = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
             XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}")
    # the suite's conftest is not in play for subprocesses; scrub any
    # inherited coordination state
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        e.pop(k, None)
    if extra:
        e.update(extra)
    return e


def _losses(text):
    return [float(m) for m in LOSS_RE.findall(text)]


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_matches_single(fake_root, tmp_path):
    cfg1 = tmp_path / "cfg1.yaml"
    cfg1.write_text(CFG.format(outdir=str(tmp_path / "run1"), root=fake_root))
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"),
           "--cfg", None, "--sample_length", "3"]

    # single process, 4 virtual devices -> global batch 4
    cmd[3] = str(cfg1)
    r1 = subprocess.run(cmd, env=_env(4), capture_output=True, text=True,
                        timeout=3000)
    assert r1.returncode == 0, (r1.stderr[-3000:], r1.stdout[-500:])
    l1 = _losses(r1.stderr + r1.stdout)
    assert l1, r1.stderr[-2000:]

    # two coordinated processes, 2 virtual devices each -> same global batch
    cfg2 = tmp_path / "cfg2.yaml"
    cfg2.write_text(CFG.format(outdir=str(tmp_path / "run2"), root=fake_root))
    cmd[3] = str(cfg2)
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            cmd, env=_env(2, {"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                              "JAX_NUM_PROCESSES": "2",
                              "JAX_PROCESS_ID": str(pid)}),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=3000))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (se[-3000:], so[-500:])
    l2 = _losses(outs[0][1] + outs[0][0])
    assert l2, outs[0][1][-2000:]

    # same steps, same losses (mean over the same global batch; only the
    # reduction order differs between the two placements)
    assert len(l1) == len(l2), (l1, l2)
    np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=1e-5)

    # both runs produced a (collectively written) checkpoint
    for run in ("run1", "run2"):
        d = os.path.join(str(tmp_path), run, "cfg1" if run == "run1"
                         else "cfg2")
        ckpts = [f for f in os.listdir(d) if f.startswith("checkpoint_")]
        assert ckpts, os.listdir(d)
