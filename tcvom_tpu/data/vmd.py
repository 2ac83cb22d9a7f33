"""VideoMatting108 dataset — host-side numpy/cv2 pipeline.

Re-design of reference dataset/VMD.py:20-301: clip sampling with mirrored
edges, paired FG(RGBA)/BG frames via frame_corr.json, quantized flow PNGs
(/100, NaN-invalid), random temporal flip, scale-crop-resize re-rolled
until unknown pixels exist, pixel/JPEG augmentation, and the val
full-resize / precomputed-pad paths. Emits fixed-shape float32 arrays
``[S, H, W, C]`` in BGR 0-255 — composition and normalization happen
on-device inside the model (models/model.py:82-92).
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:     # pragma: no cover
    cv2 = None

from tcvom_tpu.data.augment import JpegAug, PixelAug, resize_bilinear_ac

VIDEO_SHAPE = (1080, 1920)
FLOW_QUANTIZATION_SCALE = 100.0
FG_FOLDER = "FG_done"
BG_FOLDER = "BG_done"
FLOW_FOLDER = "flow_png"
# reference precomputed-val padding value (BGR ImageNet means, VMD.py:264)
IMG_PADDING_VALUE = (103.53, 116.28, 123.675)


def parse_samples(video_names: Sequence[str], frame_corr: dict, length: int):
    """Every frame becomes a sample with a mirrored-edge +-(S//2) window
    (reference VMD.py:168-184)."""
    samples = []
    for v in video_names:
        fns = [k for k in sorted(frame_corr.keys()) if os.path.dirname(k) == v]
        for i in range(len(fns)):
            sample = [None] * length
            c = length // 2
            sample[c] = fns[i]
            for j in range(length // 2):
                sample[c - j - 1] = fns[i - j - 1] if i - j - 1 >= 0 else fns[-(i - j - 1)]
                sample[c + j + 1] = (fns[i + j + 1] if i + j + 1 < len(fns)
                                     else fns[len(fns) - (i + j + 1) - 2])
            samples.append(sample)
    return samples


def read_flow_png(path: str) -> np.ndarray:
    """Quantized flow PNG: int16 dx,dy in the first channels / 100, last
    channel validity; invalid -> NaN (reference VMD.py:203-213)."""
    x = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    flow = np.float32(np.int16(x[..., :-1]))
    flow[x[..., -1] == 0] = np.nan
    return flow / FLOW_QUANTIZATION_SCALE


def flow_crop_and_resize(flow: np.ndarray, ph: int, pw: int, nsize,
                         out_shape) -> np.ndarray:
    """Flow resampling with gradient-consistency and out-of-bounds NaN
    masking (reference VMD.py:68-126). ``flow`` [H, W, 2]; returns
    [out_h, out_w, 2] with NaN where invalid."""
    if nsize is not None:
        flow = flow[ph:ph + nsize[0], pw:pw + nsize[1]]
    else:
        nsize = flow.shape[:2]
    oh, ow = out_shape

    def gradient_check(fa, fb):
        dot = (fa * fb).sum(-1)
        na = np.sqrt((fa ** 2).sum(-1))
        nb = np.sqrt((fb ** 2).sum(-1))
        nab = na * nb
        eps = 1e-6
        with np.errstate(invalid="ignore", divide="ignore"):
            cosv = np.abs(dot / nab).clip(0, 1.0 - eps)
        angle = np.arccos(cosv)
        angle_valid = angle <= np.pi / 4
        angle_valid[nab == 0] = True
        angle_valid[(na + nb) < 2] = True
        mag_valid = np.abs(na - nb) < 50
        return (angle_valid & mag_valid).astype(np.int32)

    gradh = np.pad(gradient_check(flow[:-1], flow[1:]), ((0, 1), (0, 0)),
                   constant_values=1)
    gradw = np.pad(gradient_check(flow[:, :-1], flow[:, 1:]), ((0, 0), (0, 1)),
                   constant_values=1)
    valid = gradh * gradw

    # align-corners bilinear interpolation (NaNs propagate, as in the
    # reference's grid_sampler)
    interp = resize_bilinear_ac(flow, (oh, ow), round_floor_half=False)

    # validity gather at floor source coordinates
    sh = (nsize[0] - 1) / float(oh - 1)
    sw = (nsize[1] - 1) / float(ow - 1)
    ys = np.arange(oh, dtype=np.float32) * sh
    xs = np.arange(ow, dtype=np.float32) * sw
    cy = np.clip(np.floor(ys).astype(np.int64), 0, nsize[0] - 1)
    cx = np.clip(np.floor(xs).astype(np.int64), 0, nsize[1] - 1)
    validp = valid[cy][:, cx].astype(bool)
    interp = np.where(validp[..., None], interp, np.nan)
    interp[..., 0] /= nsize[1] / float(ow)
    interp[..., 1] /= nsize[0] / float(oh)

    gy, gx = np.meshgrid(np.arange(oh, dtype=np.float32),
                         np.arange(ow, dtype=np.float32), indexing="ij")
    fx = gx + interp[..., 0]
    fy = gy + interp[..., 1]
    outbound = (fx < 0) | (fy < 0) | (fx > ow - 1) | (fy > oh - 1)
    interp[outbound] = np.nan
    return interp


class VideoMattingDataset:
    """mode='train' | 'val'; returns dict(a, fg, bg[, wb, wf], idx)."""

    def __init__(self, data_root: str, image_shape, mode: str,
                 use_subset: bool = False, no_flow: bool = False,
                 precomputed_val: str | None = None, sample_length: int = 5,
                 plus1: bool = False, seed: int = 0):
        assert mode in ("train", "val")
        self.data_root = data_root
        self.mode = mode
        self.no_flow = no_flow
        self.precomputed_val = precomputed_val
        self.sample_length = sample_length
        self.image_shape = ([image_shape[0] + 1, image_shape[1] + 1] if plus1
                            else list(image_shape))
        setname = ("{}_videos_subset.txt" if use_subset else "{}_videos.txt").format(mode)
        with open(os.path.join(data_root, "frame_corr.json")) as f:
            self.frame_corr = json.load(f)
        with open(os.path.join(data_root, setname)) as f:
            videos = [v.strip() for v in f if v.strip()]
        self.samples = parse_samples(videos, self.frame_corr, sample_length)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Augmentation draws derive from (seed, epoch, idx) — the loader
        forwards its epoch here so draws vary per epoch like the
        reference's per-epoch DataLoader RNG."""
        self.epoch = epoch

    def _item_rng(self, idx: int) -> np.random.RandomState:
        """Per-sample RandomState: deterministic for a given (seed, epoch,
        idx) no matter how many worker threads or processes consume the
        dataset — a shared RandomState would be racy across the loader's
        threads and make multi-process runs diverge from single-process
        ones with the same global batch."""
        return np.random.RandomState(
            (self.seed * 1_000_003 + self.epoch * 8_191 + idx) % (2**31 - 1))

    def __len__(self):
        return len(self.samples)

    # -- IO -----------------------------------------------------------------
    def _read_frame(self, name: str, root: str):
        f = cv2.imread(os.path.join(root, FG_FOLDER, name), cv2.IMREAD_UNCHANGED)
        bgp = os.path.join(root, BG_FOLDER, self.frame_corr[name])
        if not os.path.exists(bgp):
            bgp = os.path.splitext(bgp)[0] + ".png"
        bg = np.float32(cv2.imread(bgp, cv2.IMREAD_COLOR))
        return np.float32(f[..., :-1]), bg, np.float32(f[..., -1:])

    # -- augmentation ---------------------------------------------------------
    def _shape_aug(self, fgs, bgs, alphas, rng,
                   scales=(1.0, 1.25, 1.5, 2.0, 1.75)):
        """Random scale crop, re-rolled until unknown pixels survive
        (reference shape_aug, VMD.py:128-166). Returns crop params too so
        flow can be resampled consistently. Uses the actual frame size (the
        reference hardcodes 1080p) and only scales that fit."""
        H, W = alphas[0].shape[:2]
        assert self.image_shape[0] == self.image_shape[1]
        fitting = [s for s in scales
                   if int(self.image_shape[0] * s) < H
                   and int(self.image_shape[1] * s) < W] or [
                       min(H - 1, W - 1) / float(self.image_shape[0])]
        for attempt in range(1000):
            scale = float(rng.choice(fitting))
            nsize = (int(self.image_shape[0] * scale), int(self.image_shape[1] * scale))
            ph = rng.randint(0, H - nsize[0])
            pw = rng.randint(0, W - nsize[1])
            pa = [resize_bilinear_ac(a[ph:ph + nsize[0], pw:pw + nsize[1]],
                                     self.image_shape) for a in alphas]
            if all(np.sum((x > 0) & (x < 255)) >= 1 for x in pa):
                break
        # after 1000 re-rolls accept the last crop (the reference loops
        # forever; a clip with no unknown pixels anywhere would hang it)
        pfg = [resize_bilinear_ac(f[ph:ph + nsize[0], pw:pw + nsize[1]],
                                  self.image_shape) for f in fgs]
        pbg = [resize_bilinear_ac(b[ph:ph + nsize[0], pw:pw + nsize[1]],
                                  self.image_shape) for b in bgs]
        return pfg, pbg, pa, (ph, pw, nsize)

    def __getitem__(self, idx: int):
        sample = list(self.samples[idx])
        rng = self._item_rng(idx)
        if self.mode == "train" and rng.rand() > 0.5:
            sample = sample[::-1]
        s = len(sample)
        root = self.data_root if self.precomputed_val is None else self.precomputed_val
        dn = os.path.dirname(sample[0])

        fgs, bgs, alphas = [], [], []
        for name in sample:
            f, b, a = self._read_frame(name, root)
            fgs.append(f)
            bgs.append(b)
            alphas.append(a)

        flows_b = [None] * s
        flows_f = [None] * s
        if not self.no_flow:
            fns = [os.path.splitext(os.path.basename(n))[0] for n in sample]

            def _fl(a, b):
                return read_flow_png(os.path.join(
                    self.data_root, FLOW_FOLDER, dn, f"flow_{a}_{b}.png"))

            for i in range(2, s - 2):
                flows_f[i] = _fl(fns[i], fns[i + 1])
                flows_b[i] = _fl(fns[i], fns[i - 1])
            flows_f[1] = _fl(fns[1], fns[2])
            flows_b[-2] = _fl(fns[-2], fns[-3])

        if self.mode == "train":
            fgs, bgs, alphas, (ph, pw, nsize) = self._shape_aug(fgs, bgs, alphas, rng)
            if not self.no_flow:
                for i in range(s):
                    if flows_b[i] is not None:
                        flows_b[i] = flow_crop_and_resize(
                            flows_b[i], ph, pw, nsize, self.image_shape)
                    if flows_f[i] is not None:
                        flows_f[i] = flow_crop_and_resize(
                            flows_f[i], ph, pw, nsize, self.image_shape)
            paug_fg = PixelAug(rng)
            p_fg = paug_fg.sample()
            p_bg = paug_fg.sample()
            jp = JpegAug(rng).sample()
            for i in range(s):
                f = PixelAug.apply(np.uint8(fgs[i]), p_fg)
                f = JpegAug.apply(f, jp)
                fgs[i] = np.float32(f)
                bgs[i] = np.float32(PixelAug.apply(np.uint8(bgs[i]), p_bg))
        else:
            if self.precomputed_val is not None:
                for i in range(s):
                    fgs[i] = self._pad(fgs[i], IMG_PADDING_VALUE)
                    bgs[i] = self._pad(bgs[i], IMG_PADDING_VALUE)
                    alphas[i] = self._pad(alphas[i], 0.0)
                    if flows_b[i] is not None:
                        flows_b[i] = self._pad(flows_b[i], np.nan)
                    if flows_f[i] is not None:
                        flows_f[i] = self._pad(flows_f[i], np.nan)
            else:
                for i in range(s):
                    fgs[i] = resize_bilinear_ac(fgs[i], self.image_shape)
                    bgs[i] = resize_bilinear_ac(bgs[i], self.image_shape)
                    alphas[i] = resize_bilinear_ac(alphas[i], self.image_shape)
                    if flows_b[i] is not None:
                        flows_b[i] = flow_crop_and_resize(
                            flows_b[i], 0, 0, None, self.image_shape)
                    if flows_f[i] is not None:
                        flows_f[i] = flow_crop_and_resize(
                            flows_f[i], 0, 0, None, self.image_shape)

        out = {
            "a": np.stack(alphas).astype(np.float32),
            "fg": np.stack(fgs).astype(np.float32),
            "bg": np.stack(bgs).astype(np.float32),
            "idx": np.int32(idx),
        }
        if not self.no_flow:
            nanf = np.full(self.image_shape + [2], np.nan, np.float32)
            out["wb"] = np.stack([f if f is not None else nanf for f in flows_b]).astype(np.float32)
            out["wf"] = np.stack([f if f is not None else nanf for f in flows_f]).astype(np.float32)
        return out

    def _pad(self, t: np.ndarray, value):
        H, W = t.shape[:2]
        ph, pw = self.image_shape[0] - H, self.image_shape[1] - W
        if ph == 0 and pw == 0:
            return t
        assert ph >= 0 and pw >= 0
        if np.isscalar(value) or value is np.nan:
            return np.pad(t, ((0, ph), (0, pw), (0, 0)), constant_values=value)
        out = np.pad(t, ((0, ph), (0, pw), (0, 0)))
        out[H:, :, :] = np.asarray(value, t.dtype)
        out[:, W:, :] = np.asarray(value, t.dtype)
        return out
