"""Adobe-DIM pretrain dataset: synthesizes 3 fake video frames per still
via random affine chains (re-design of reference dataset/DIM.py:17-356).

Train: resize-to-min-shape, uniform crop to min_shape, 3-frame affine
synthesis, flip + random {512..768} crop, resize to image_shape. Eval:
deterministic affine variant with per-method padding conventions
(gca/dim/origin/resize).
"""
from __future__ import annotations

import os

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:      # pragma: no cover
    cv2 = None

from tcvom_tpu.data.augment import PixelAug


def _rotate(M, center, angle, scale):
    Mn = cv2.getRotationMatrix2D((float(center[0]), float(center[1])),
                                 float(angle), float(scale))
    return M @ np.concatenate([Mn, [[0, 0, 1]]])


def _move(M, vec):
    Mn = np.float32([[1, 0, vec[0]], [0, 1, vec[1]], [0, 0, 1]])
    return M @ Mn


def _apply_var(M, var):
    center, move, angle, scale = var
    return _move(_rotate(M, center, angle, scale), move)


def synth_frames3(fg, bg, alpha, rng: np.random.RandomState | None):
    """3-frame affine synthesis (reference make_frames3, DIM.py:97-158).
    ``rng=None`` selects the deterministic eval variant (DIM.py:310-356).
    Returns (fgs, bgs, alphas, good_sample)."""
    bh, bw = bg.shape[:2]
    fh, fw = fg.shape[:2]
    I = np.eye(3, dtype=np.float32)

    if rng is not None:
        def rand_var(w, h, move_max=20, rot_center=10, rot_angle=2,
                     smin=1.0, smax=1.0):
            center = rot_center * 2 * (rng.random_sample(2) - 0.5) + \
                np.array([w / 2, h / 2], np.float32)
            move = rng.randint(-move_max, move_max, 2)
            angle = (rng.random_sample() - 0.5) * 2.0 * rot_angle
            scale = rng.random_sample() * (smax - smin) + smin
            return center, move, angle, scale

        dh, dw = (bh - fh) / 2.0, (bw - fw) / 2.0
        rh = (rng.random_sample() - 0.5) * 2.0
        rw = (rng.random_sample() - 0.5) * 2.0
        FM0 = _move(I, [rh * dh, rw * dw])
        ff = rand_var(fw, fh, move_max=200, rot_angle=10, smin=0.9, smax=1.1)
        fstep = rand_var(fw, fh)
        bstep = rand_var(bw, bh, rot_center=0, rot_angle=0)
        FM0 = _apply_var(I, ff) @ FM0
    else:
        FM0 = I
        fstep = (np.array([fw * 0.5, fh * 0.5]), np.array([-5, -5]), -2, 0.99)
        bstep = (np.array([fw * 0.5, fh * 0.5]), np.array([5, 5]), 2, 1.01)

    FMs = _apply_var(I, fstep)
    BMs = _apply_var(I, bstep)
    FM_ = [np.linalg.inv(FMs), I, FMs]
    BM_ = [np.linalg.inv(BMs), I, BMs]

    fgs, bgs, alphas = [], [], []
    good = True
    for i in range(3):
        FM = FM_[i] @ FM0
        fgs.append(cv2.warpPerspective(fg, FM, (bw, bh)))
        bgs.append(cv2.warpPerspective(bg, BM_[i], (bw, bh)))
        a = cv2.warpPerspective(alpha, FM, (bw, bh))[..., None]
        alphas.append(a)
        if np.sum((a > 0) & (a < 255)) < 400:
            good = False
    return fgs, bgs, alphas, good


class DIMPretrainDataset:
    CROP_SIZES = (512, 576, 640, 704, 768)
    sample_length = 3     # always synthesizes 3 frames (center index 1)

    def __init__(self, data_root: str, image_shape=None, min_shape: int = 800,
                 val_mode: str | None = None, plus1: bool = True,
                 is_train: bool = True, seed: int = 0):
        self.data_root = data_root
        self.is_train = is_train
        self.val_mode = val_mode
        self.min_shape = min_shape
        if is_train:
            self.image_shape = tuple(image_shape)
        else:
            assert val_mode in ("gca", "dim", "origin", "resize")
            self.image_shape = (min_shape, min_shape)
            if val_mode == "origin":
                self.min_shape = 2112
                self.image_shape = (2112, 2112)
        if plus1:
            self.image_shape = (self.image_shape[0] + 1, self.image_shape[1] + 1)

        prefix = "train" if is_train else "val"
        bg_set = [l.strip() for l in open(os.path.join(
            data_root, f"bg_{prefix}_set.txt"))]
        if is_train:
            fg_lines = [l.strip() for l in open(os.path.join(
                data_root, "fg_train_set_old.txt"))]
            fg_set = [fg_lines[i // 100] for i in range(len(bg_set))]
        else:
            fg_set = [l.strip() for l in open(os.path.join(
                data_root, "fg_val_set.txt"))]
        assert len(fg_set) == len(bg_set)
        self.sample_fn = [(f.split(" ")[0], f.split(" ")[1], b)
                          for f, b in zip(fg_set, bg_set)]
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _item_rng(self, idx: int) -> np.random.RandomState:
        """Per-(seed, epoch, idx) RandomState — thread-safe and identical
        across process counts (see VideoMattingDataset._item_rng)."""
        return np.random.RandomState(
            (self.seed * 1_000_003 + self.epoch * 8_191 + idx) % (2**31 - 1))

    def __len__(self):
        return len(self.sample_fn)

    # -- resize helpers (reference DIM.py:177-214) ---------------------------
    def _resize_ratio(self, img, a=None, use_short=True, force=False,
                      interpolation=None):
        interpolation = interpolation or cv2.INTER_AREA
        tgt = self.min_shape
        short = min(img.shape[:2]) if use_short else max(img.shape[:2])
        if short < tgt or force:
            r = tgt / float(short)
            if use_short:
                new = (max(int(img.shape[1] * r), tgt), max(int(img.shape[0] * r), tgt))
            else:
                new = (min(int(img.shape[1] * r), tgt), min(int(img.shape[0] * r), tgt))
            img = cv2.resize(np.float32(img), new, interpolation=interpolation)
            img = np.clip(img, 0, 255)
            if a is not None:
                a = np.clip(cv2.resize(np.float32(a), new,
                                       interpolation=interpolation), 0, 255)
        if a is not None:
            return np.uint8(img), np.uint8(a)
        return np.uint8(img)

    def _crop(self, imgs, size_hw, uniform: bool, rng=None):
        """CropToFixedSize for a group with shared offsets."""
        h, w = imgs[0].shape[:2]
        th, tw = size_hw
        th, tw = min(th, h), min(tw, w)
        if uniform:
            y0 = rng.randint(0, h - th + 1)
            x0 = rng.randint(0, w - tw + 1)
        else:
            y0, x0 = (h - th) // 2, (w - tw) // 2
        return [im[y0:y0 + th, x0:x0 + tw] for im in imgs]

    def __getitem__(self, idx: int):
        fg_fn, a_fn, bg_fn = self.sample_fn[idx]
        rng = self._item_rng(idx)
        ofg = cv2.imread(os.path.join(self.data_root, fg_fn), cv2.IMREAD_COLOR)
        oa = cv2.imread(os.path.join(self.data_root, a_fn), cv2.IMREAD_GRAYSCALE)
        obg = cv2.imread(os.path.join(self.data_root, bg_fn), cv2.IMREAD_COLOR)
        og_shape = ofg.shape[:2]

        while True:
            fg, bg, a = np.array(ofg), np.array(obg), np.array(oa)
            if self.is_train:
                fg, a = self._resize_ratio(fg, a)
                bg = self._resize_ratio(bg, interpolation=cv2.INTER_CUBIC)
                fg, a = self._crop([fg, a], (self.min_shape, self.min_shape), True, rng)
                (bg,) = self._crop([bg], (self.min_shape, self.min_shape), True, rng)
            else:
                if self.val_mode == "resize":
                    fg, a = self._resize_ratio(fg, a, use_short=False, force=True)
                ratio = max(fg.shape[0] / bg.shape[0], fg.shape[1] / bg.shape[1])
                new = (int(np.ceil(bg.shape[1] * ratio)), int(np.ceil(bg.shape[0] * ratio)))
                bg = np.uint8(np.clip(cv2.resize(np.float32(bg), new,
                                                 interpolation=cv2.INTER_CUBIC), 0, 255))
                bg = bg[:fg.shape[0], :fg.shape[1]]
                if self.val_mode == "dim":
                    def r32(img):
                        h = int(np.ceil(img.shape[0] / 32.0) * 32)
                        w = int(np.ceil(img.shape[1] / 32.0) * 32)
                        return np.uint8(np.clip(cv2.resize(
                            np.float32(img), (w, h),
                            interpolation=cv2.INTER_CUBIC), 0, 255))
                    fg, a, bg = r32(fg), r32(a), r32(bg)
                mode = "reflect" if self.val_mode == "gca" else "constant"
                ph = self.image_shape[0] - fg.shape[0]
                pw = self.image_shape[1] - fg.shape[1]
                if ph < 0 or pw < 0:
                    raise ValueError(
                        f"eval image {fg.shape[:2]} exceeds the "
                        f"{self.image_shape} grid (val_mode="
                        f"{self.val_mode!r}); raise min_shape or use "
                        f"val_mode='resize'")
                fg = np.pad(fg, ((0, ph), (0, pw), (0, 0)), mode=mode)
                bg = np.pad(bg, ((0, ph), (0, pw), (0, 0)), mode=mode)
                a = np.pad(a, ((0, ph), (0, pw)), mode=mode)

            fgs, bgs, alphas, good = synth_frames3(
                fg, bg, a, rng if self.is_train else None)
            if good:
                break
            if not self.is_train:
                break  # eval variant never re-rolls

        if self.is_train:
            flip = rng.rand() < 0.5
            crop = int(rng.choice(self.CROP_SIZES))
            h, w = fgs[0].shape[:2]
            y0 = rng.randint(0, max(h - crop, 0) + 1)
            x0 = rng.randint(0, max(w - crop, 0) + 1)
            for i in range(3):
                def proc(img, inter):
                    im = img[:, ::-1] if flip else img
                    im = im[y0:y0 + crop, x0:x0 + crop]
                    out = cv2.resize(np.float32(im),
                                     (self.image_shape[1], self.image_shape[0]),
                                     interpolation=inter)
                    return np.clip(out, 0, 255)
                fgs[i] = proc(fgs[i], cv2.INTER_AREA)
                bgs[i] = proc(bgs[i], cv2.INTER_CUBIC)
                fa = proc(alphas[i], cv2.INTER_AREA)
                alphas[i] = fa if fa.ndim == 3 else fa[..., None]

        out = {
            "a": np.stack([np.float32(x).reshape(x.shape[0], x.shape[1], 1)
                           for x in alphas]),
            "fg": np.stack([np.float32(x) for x in fgs]),
            "bg": np.stack([np.float32(x) for x in bgs]),
            "idx": np.int32(idx),
        }
        if not self.is_train:
            out["og_shape"] = np.asarray(og_shape, np.int32)
        return out


class DIMEvalDataset(DIMPretrainDataset):
    def __init__(self, **kwargs):
        super().__init__(is_train=False, **kwargs)
