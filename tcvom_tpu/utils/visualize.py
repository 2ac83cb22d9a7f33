"""Training-image dumps (reference write_image, train_ddp.py:27-38):
periodic grids of img / trimap / alpha / comp / gt / fg / bg."""
from __future__ import annotations

import os

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:      # pragma: no cover
    cv2 = None


def save_image_grid(arr: np.ndarray, path: str, nrow: int = 8,
                    padding: int = 2):
    """``arr``: [N, H, W, C] floats in [0, 1] (RGB or single channel).
    Tiles like torchvision.utils.save_image."""
    arr = np.asarray(arr)
    n, h, w, c = arr.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), arr.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = arr[i]
    img = np.uint8(np.clip(grid, 0, 1) * 255)
    if c == 3:
        img = img[..., ::-1]          # RGB -> BGR for cv2
    else:
        img = img[..., 0]
    cv2.imwrite(path, img)


def write_val_triplets(outdir: str, alphas, tris, gts, start_idx: int):
    """Per-frame pred/tri/gt PNG triplets during validation — the visual
    sanity artifacts the reference's validate() wrote per epoch
    (train_ddp.py:129-138). ``alphas``/``tris``/``gts``: [B, H, W, 1] in
    [0, 1] (center frame). Returns the next index."""
    os.makedirs(outdir, exist_ok=True)
    alphas, tris, gts = (np.asarray(t) for t in (alphas, tris, gts))
    for i in range(alphas.shape[0]):
        n = start_idx + i
        for tag, t in (("pred", alphas), ("tri", tris), ("gt", gts)):
            cv2.imwrite(os.path.join(outdir, f"{n:05d}_{tag}.png"),
                        np.uint8(np.clip(t[i, ..., 0], 0, 1) * 255))
    return start_idx + alphas.shape[0]


def write_training_images(outdir: str, aux: dict, step: int,
                          max_batch: int = 4):
    """Dump the standard 7-grid set every IMAGE_FREQ iterations."""
    pre = aux["pre"]

    def grab(t):
        t = np.asarray(t)[:max_batch]
        b, s = t.shape[:2]
        return t.reshape((b * s,) + t.shape[2:]), s

    os.makedirs(outdir, exist_ok=True)
    for name, tensor in [("image", pre["scaled_imgs"]),
                         ("tris", pre["trimasks"]),
                         ("as", aux["alphas"]),
                         ("comps", aux["comps"]),
                         ("gts", pre["scaled_gts"]),
                         ("fgs", aux["Fs"]), ("bgs", aux["Bs"])]:
        flat, s = grab(tensor)
        save_image_grid(flat, os.path.join(outdir, f"vis_{name}_{step}.png"),
                        nrow=s)
