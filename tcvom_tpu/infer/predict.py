"""Inference pipelines.

TPU-native re-design of the reference's three inference drivers:
- ``predict_vmd``    (pred_vmn.py): VideoMatting108 val sweep through the
  *training* wrapper — trimaps re-synthesized from gt alpha at a fixed
  dilation, 3-frame sliding window at 1088x1920, per-frame pred/tri PNGs +
  loss.log for calc_metric.
- ``predict_single`` (pred_single.py): same but single-frame wrapper.
- ``predict_test``   (pred_test.py): wild folders with real trimaps
  through the EvalModel path, padded to /32 and cropped back.

One jitted step serves the whole sweep (static shapes); batches shard over
the data mesh instead of nn.DataParallel scatter/gather.
"""
from __future__ import annotations

import os
from typing import Callable

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:     # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from tcvom_tpu.models import full_model as FM

TRIMAP_DILATION = {"narrow": 5, "medium": 12, "wide": 20}  # pred_vmn.py:70-75


def make_vmd_eval_step(module, cfg: FM.TaskConfig):
    """Jitted forward through FullModel_VMD returning per-batch loss sums,
    center-frame alphas and the trimap visualization."""

    @jax.jit
    def step(variables, batch, key):
        losses, aux, _ = FM.forward_vmd(module, variables, key, batch, cfg,
                                        train=False)
        pre = aux["pre"]
        c = batch["a"].shape[1] // 2
        tris_vis = jnp.where(pre["trimasks"] > 0.5, 128.0 / 255.0,
                             pre["scaled_gts"])
        return losses, aux["alphas"][:, c], tris_vis[:, c]

    return step


def make_single_eval_step(module, cfg: FM.TaskConfig):
    @jax.jit
    def step(variables, batch, key):
        losses, aux, _ = FM.forward_single(module, variables, key, batch, cfg,
                                           train=False)
        pre = aux["pre"]
        c = batch["a"].shape[1] // 2
        if cfg.trimap_channels != 1:
            tris_vis = jnp.where(pre["trimasks"] > 0.5, 128.0 / 255.0,
                                 pre["scaled_gts"])
        else:
            tris_vis = pre["tris"]
        return losses, aux["alphas"][:, c], tris_vis[:, c]

    return step


def write_pred_pngs(save_dir: str, names: list[str], alphas: np.ndarray,
                    tris: np.ndarray, crop_hw=(1080, 1920)):
    """Write <name>_pred.png / <name>_tri.png cropped to the original
    resolution (pred_vmn.py:125-135)."""
    h, w = crop_hw
    for i, name in enumerate(names):
        fn = os.path.splitext(name)[0]
        os.makedirs(os.path.join(save_dir, os.path.dirname(fn)), exist_ok=True)
        a = np.uint8(np.clip(alphas[i, :h, :w, 0], 0, 1) * 255)
        t = np.uint8(np.clip(tris[i, :h, :w, 0], 0, 1) * 255)
        cv2.imwrite(os.path.join(save_dir, fn + "_pred.png"), a)
        cv2.imwrite(os.path.join(save_dir, fn + "_tri.png"), t)


# ---------------------------------------------------------------------------
# Wild-video test folders (pred_test.py)
# ---------------------------------------------------------------------------

class TestFolder:
    """(prev, cur, next) frame triplets from NNNNN_rgb.png / NNNNN_trimap.png
    folders, edge-mirrored, padded to multiples of 32
    (reference pred_test.py:17-84)."""

    def __init__(self, root: str):
        self.root = root
        names = sorted(f[:-8] for f in os.listdir(root) if f.endswith("_rgb.png"))
        assert names, f"no *_rgb.png in {root}"
        self.names = names

    def __len__(self):
        return len(self.names)

    def _read(self, i):
        name = self.names[i]
        img = cv2.imread(os.path.join(self.root, name + "_rgb.png"), cv2.IMREAD_COLOR)
        tri = cv2.imread(os.path.join(self.root, name + "_trimap.png"),
                         cv2.IMREAD_GRAYSCALE)
        return np.float32(img), np.float32(tri)[..., None]

    def __getitem__(self, i):
        idxs = [max(i - 1, 0), i, min(i + 1, len(self.names) - 1)]
        imgs, tris = zip(*[self._read(j) for j in idxs])
        h, w = imgs[0].shape[:2]
        ph = (-h) % 32
        pw = (-w) % 32
        pad = lambda t: np.pad(t, ((0, ph), (0, pw), (0, 0)))
        return {
            "imgs": np.stack([pad(x) for x in imgs]),
            "tris": np.stack([pad(x) for x in tris]),
            "orig_hw": np.asarray((h, w), np.int32),
            "name": self.names[i],
        }


def predict_test_folder(module, variables, cfg: FM.TaskConfig, in_dir: str,
                        out_dir: str, progress: Callable | None = None):
    """EvalModel inference over a wild folder; writes <name>_alpha.png
    (reference pred_test.py:86-116)."""
    folder = TestFolder(in_dir)
    os.makedirs(out_dir, exist_ok=True)
    step = jax.jit(lambda v, imgs, tris: FM.forward_eval(module, v, imgs, tris, cfg))
    for i in range(len(folder)):
        item = folder[i]
        out = step(variables, jnp.asarray(item["imgs"])[None],
                   jnp.asarray(item["tris"])[None])
        alphas = out[0] if isinstance(out, tuple) else out
        c = item["imgs"].shape[0] // 2
        h, w = item["orig_hw"]
        a = np.asarray(alphas)[0, c, :h, :w, 0]
        cv2.imwrite(os.path.join(out_dir, item["name"] + "_alpha.png"),
                    np.uint8(np.clip(a, 0, 1) * 255))
        if progress:
            progress(i, len(folder))
