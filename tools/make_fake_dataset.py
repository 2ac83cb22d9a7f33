#!/usr/bin/env python
"""Generate a tiny synthetic VideoMatting108-format dataset for smoke tests
and CI: FG_done/<clip>/NNNNN.png (RGBA), BG_done pairs, frame_corr.json,
train/val video lists, and quantized flow PNGs (zero flow, all valid)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

import cv2


def make(root: str, clips=("clip_a", "clip_b"), frames=6, hw=(1080, 1920),
         seed=0):
    rng = np.random.RandomState(seed)
    h, w = hw
    frame_corr = {}
    for ci, clip in enumerate(clips):
        os.makedirs(os.path.join(root, "FG_done", clip), exist_ok=True)
        os.makedirs(os.path.join(root, "BG_done", clip), exist_ok=True)
        os.makedirs(os.path.join(root, "flow_png", clip), exist_ok=True)
        cx, cy = rng.randint(w // 4, 3 * w // 4), rng.randint(h // 4, 3 * h // 4)
        for i in range(frames):
            name = f"{i:05d}.png"
            fg = rng.randint(0, 256, (h, w, 3), np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            d = np.sqrt((xx - cx - 5 * i) ** 2 + (yy - cy) ** 2)
            # blob scaled to the frame so the soft (unknown) ring is
            # always in view
            rad = 0.25 * min(h, w)
            soft = 0.15 * min(h, w)
            alpha = np.clip((rad - d) / soft + 1.0, 0, 1)
            rgba = np.concatenate([fg, np.uint8(alpha[..., None] * 255)], -1)
            cv2.imwrite(os.path.join(root, "FG_done", clip, name), rgba)
            bg = rng.randint(0, 256, (h, w, 3), np.uint8)
            cv2.imwrite(os.path.join(root, "BG_done", clip, name), bg)
            frame_corr[f"{clip}/{name}"] = f"{clip}/{name}"
        # zero flow, valid everywhere, for consecutive pairs (both dirs)
        flow = np.zeros((h, w, 3), np.uint16)
        flow[..., 2] = 255
        for i in range(frames - 1):
            a, b = f"{i:05d}", f"{i + 1:05d}"
            cv2.imwrite(os.path.join(root, "flow_png", clip,
                                     f"flow_{a}_{b}.png"), flow)
            cv2.imwrite(os.path.join(root, "flow_png", clip,
                                     f"flow_{b}_{a}.png"), flow)
    with open(os.path.join(root, "frame_corr.json"), "w") as f:
        json.dump(frame_corr, f)
    for mode, vids in [("train", clips[:1]), ("val", clips[1:])]:
        with open(os.path.join(root, f"{mode}_videos.txt"), "w") as f:
            f.write("\n".join(vids) + "\n")
        with open(os.path.join(root, f"{mode}_videos_subset.txt"), "w") as f:
            f.write("\n".join(vids) + "\n")


def make_adobe(root: str, n: int = 2, hw=(80, 56), seed=0):
    """Tiny synthetic Adobe-DIM tree (reference dataset/DIM.py layout):
    fg_val_set.txt lines are '<fg> <alpha>', bg_val_set.txt one bg path per
    line; differently-sized stills to exercise per-sample cropping."""
    rng = np.random.RandomState(seed)
    for d in ("fg", "alpha", "bg"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    fg_lines, bg_lines = [], []
    for i in range(n):
        h, w = hw[0] + 8 * i, hw[1] + 4 * i
        fg = rng.randint(0, 256, (h, w, 3), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        d = np.sqrt((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
        alpha = np.uint8(np.clip((0.3 * min(h, w) - d) / (0.2 * min(h, w))
                                 + 1.0, 0, 1) * 255)
        bg = rng.randint(0, 256, (h * 2, w * 2, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "fg", f"{i}.png"), fg)
        cv2.imwrite(os.path.join(root, "alpha", f"{i}.png"), alpha)
        cv2.imwrite(os.path.join(root, "bg", f"{i}.jpg"), bg)
        fg_lines.append(f"fg/{i}.png alpha/{i}.png")
        bg_lines.append(f"bg/{i}.jpg")
    with open(os.path.join(root, "fg_val_set.txt"), "w") as f:
        f.write("\n".join(fg_lines) + "\n")
    with open(os.path.join(root, "bg_val_set.txt"), "w") as f:
        f.write("\n".join(bg_lines) + "\n")
    # train-mode lists too (pretrain_ddp path): each fg line covers 100 bgs
    # in the reference layout, so one fg is enough for a tiny bg set
    with open(os.path.join(root, "fg_train_set_old.txt"), "w") as f:
        f.write("\n".join(fg_lines) + "\n")
    with open(os.path.join(root, "bg_train_set.txt"), "w") as f:
        f.write("\n".join(bg_lines) + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    a = p.parse_args()
    make(a.root, frames=a.frames, hw=(a.height, a.width))
    print("fake dataset at", a.root)
