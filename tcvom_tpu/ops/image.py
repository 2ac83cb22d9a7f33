"""Core image-tensor primitives, NHWC layout, static shapes.

These are the TPU-native equivalents of the torch ops the reference relies
on (F.interpolate, F.unfold, F.max_pool2d(return_indices), F.grid_sample,
F.pixel_shuffle — see /root/reference/utils/utils.py and the model files).
Semantics are matched exactly where the reference depends on them (interp
corner conventions, zero-padded unfold, first-index max-pool ties) so that
converted checkpoints reproduce reference activations.

All functions take channel-last tensors ``[..., H, W, C]`` and are
jit/vmap/grad-friendly (no data-dependent shapes).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Resizing (exact torch F.interpolate parity)
# ---------------------------------------------------------------------------

def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Float source coordinates for each output pixel along one axis."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    return jnp.clip((i + 0.5) * scale - 0.5, 0.0, None)


def _gather_axis(x: jnp.ndarray, idx: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, idx, axis=axis)


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int, align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    src = _source_coords(out_size, in_size, align_corners)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = (src - lo.astype(jnp.float32))
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape).astype(x.dtype)
    return _gather_axis(x, lo, axis) * (1 - w) + _gather_axis(x, hi, axis) * w


def _upsample2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsampling (half-pixel centers) along ``axis`` as
    shifts + interleave — no gathers, so XLA lowers it to cheap fused
    adds instead of a full-tensor gather (the decoder hot path)."""
    n = x.shape[axis]
    lo = jnp.concatenate([lax.slice_in_dim(x, 0, 1, axis=axis),
                          lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis),
                          lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
    even = 0.75 * x + 0.25 * lo          # out[2i]   = .25*in[i-1] + .75*in[i]
    odd = 0.75 * x + 0.25 * hi           # out[2i+1] = .75*in[i] + .25*in[i+1]
    stacked = jnp.stack([even, odd], axis=axis + 1)
    return stacked.reshape(x.shape[:axis] + (2 * n,) + x.shape[axis + 1:])


def resize_bilinear(x: jnp.ndarray, size: Sequence[int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of ``[..., H, W, C]`` matching torch ``F.interpolate``.

    ``align_corners=False`` uses half-pixel centers (torch default);
    ``align_corners=True`` uses corner-aligned sampling. Both are separable.
    Exact 2x upsampling takes a structured shift/interleave path.
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    if not align_corners and size[0] == 2 * x.shape[h_axis] \
            and size[1] == 2 * x.shape[w_axis]:
        return _upsample2x_axis(_upsample2x_axis(x, h_axis), w_axis)
    if x.shape[h_axis] != size[0]:
        x = _interp_axis(x, int(size[0]), h_axis, align_corners)
    if x.shape[w_axis] != size[1]:
        x = _interp_axis(x, int(size[1]), w_axis, align_corners)
    return x


def _repeat_axis(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    b = jnp.broadcast_to(jnp.expand_dims(x, axis + 1),
                         x.shape[:axis + 1] + (r,) + x.shape[axis + 1:])
    return b.reshape(x.shape[:axis] + (n * r,) + x.shape[axis + 1:])


def resize_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Nearest resize matching torch ``F.interpolate(mode='nearest')``:
    ``src = floor(dst * in/out)``. Integer upscaling is a broadcast-repeat
    (no gathers)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = int(size[0]), int(size[1])
    if out_h % in_h == 0 and out_w % in_w == 0:
        if out_h != in_h:
            x = _repeat_axis(x, out_h // in_h, h_axis)
        if out_w != in_w:
            x = _repeat_axis(x, out_w // in_w, w_axis)
        return x
    if in_h != out_h:
        idx = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)).astype(jnp.int32)
        x = jnp.take(x, jnp.clip(idx, 0, in_h - 1), axis=h_axis)
    if in_w != out_w:
        idx = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)).astype(jnp.int32)
        x = jnp.take(x, jnp.clip(idx, 0, in_w - 1), axis=w_axis)
    return x


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def avg_pool(x: jnp.ndarray, window: int, stride: int | None = None,
             padding: int = 0) -> jnp.ndarray:
    """Average pool over H, W of ``[..., H, W, C]`` (torch ``F.avg_pool2d``)."""
    stride = stride or window
    nb = x.ndim - 3
    dims = (1,) * nb + (window, window, 1)
    strides = (1,) * nb + (stride, stride, 1)
    pads = [(0, 0)] * nb + [(padding, padding), (padding, padding), (0, 0)]
    # Python-scalar init keeps the differentiable reduce_window_sum dispatch
    s = lax.reduce_window(x, 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
                          lax.add, dims, strides, pads)
    return s / (window * window)


def max_pool(x: jnp.ndarray, window: int, stride: int | None = None,
             padding: int = 0) -> jnp.ndarray:
    """Max pool over H, W of ``[..., H, W, C]`` (torch ``F.max_pool2d``)."""
    stride = stride or window
    nb = x.ndim - 3
    dims = (1,) * nb + (window, window, 1)
    strides = (1,) * nb + (stride, stride, 1)
    pads = [(0, 0)] * nb + [(padding, padding), (padding, padding), (0, 0)]
    # NB: the init value must be a Python scalar — a traced array defeats
    # the dispatch to the differentiable reduce_window_max primitive.
    neg = (-float("inf") if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(x, neg, lax.max, dims, strides, pads)


def max_pool_argmax_2x2(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/stride-2 max pool returning (pooled, local_argmax).

    ``local_argmax`` is an int32 in [0, 4) giving the in-window position
    (row-major) of the max, first occurrence on ties — matching torch
    ``nn.MaxPool2d(2, 2, return_indices=True)`` so DIM's MaxUnpool decoder
    (reference models/DIM/vggnet.py:23,61) round-trips exactly. H and W must
    be even (the drivers pad inputs to multiples of 32).
    """
    *b, h, w, c = x.shape
    xw = x.reshape(*b, h // 2, 2, w // 2, 2, c)
    xw = jnp.moveaxis(xw, -4, -3)              # [..., h/2, w/2, 2, 2, c]
    xw = xw.reshape(*b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(xw, axis=-2).astype(jnp.int32)   # first max on ties
    pooled = jnp.max(xw, axis=-2)
    return pooled, idx


def max_unpool_2x2(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`max_pool_argmax_2x2`: scatter each value to its
    recorded in-window slot, zeros elsewhere (torch ``nn.MaxUnpool2d(2, 2)``)."""
    *b, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=-2)  # [..., h, w, 4, c]
    scat = x[..., None, :] * onehot
    scat = scat.reshape(*b, h, w, 2, 2, c)
    scat = jnp.moveaxis(scat, -3, -4)                        # [..., h, 2, w, 2, c]
    return scat.reshape(*b, h * 2, w * 2, c)


def max_pool_argmax(x: jnp.ndarray, window: int, stride: int, padding: int
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """General max pool returning flat HW argmax indices (torch semantics).

    Used for FBA's ``MaxPool2d(3, 2, 1, return_indices=True)``
    (reference models/FBA/resnet_GN_WS.py:97). Returns (pooled, flat_idx)
    where flat_idx indexes into the padded-free input H*W grid.
    """
    *b, h, w, c = x.shape
    neg = jnp.finfo(x.dtype).min
    flat = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(padding, padding), (padding, padding), (0, 0)],
                 constant_values=neg)
    ip = jnp.pad(flat, padding, constant_values=h * w)
    out_h = (h + 2 * padding - window) // stride + 1
    out_w = (w + 2 * padding - window) // stride + 1
    vals, idxs = [], []
    for di in range(window):
        for dj in range(window):
            v = lax.slice_in_dim(lax.slice_in_dim(xp, di, di + (out_h - 1) * stride + 1, stride,
                                                  axis=x.ndim - 3),
                                 dj, dj + (out_w - 1) * stride + 1, stride, axis=x.ndim - 2)
            i = ip[di:di + (out_h - 1) * stride + 1:stride, dj:dj + (out_w - 1) * stride + 1:stride]
            vals.append(v)
            idxs.append(jnp.broadcast_to(i[..., None], v.shape).astype(jnp.int32))
    vs = jnp.stack(vals, axis=-2)   # [..., oh, ow, k*k, c]
    is_ = jnp.stack(idxs, axis=-2)
    best = jnp.argmax(vs, axis=-2)
    pooled = jnp.max(vs, axis=-2)
    flat_idx = jnp.take_along_axis(is_, best[..., None, :], axis=-2)[..., 0, :]
    return pooled, flat_idx


def adaptive_avg_pool(x: jnp.ndarray, out_size: int | tuple[int, int]) -> jnp.ndarray:
    """Exact torch ``AdaptiveAvgPool2d`` on ``[..., H, W, C]``.

    Bin i spans [floor(i*H/s), ceil((i+1)*H/s)). Computed as two small
    matmuls with bin-average matrices — on TPU the reduction rides the MXU
    in one pass (a cumsum-integral formulation costs ~8 ms on FBA's
    [136,240,2048] conv5 at 1080p; this costs <0.5 ms), and uneven bins
    (e.g. 240 -> 6 for the PPM, reference models/FBA/models.py:268) stay
    exact."""
    if isinstance(out_size, int):
        out_size = (out_size, out_size)

    def pool_matrix(n: int, s: int, dtype) -> jnp.ndarray:
        import numpy as np
        p = np.zeros((s, n), np.float32)
        for i in range(s):
            st = i * n // s
            en = -(-(i + 1) * n // s)
            p[i, st:en] = 1.0 / (en - st)
        return jnp.asarray(p, dtype)

    s0, s1 = out_size
    if x.shape[-3] != s0:
        x = jnp.einsum("sh,...hwc->...swc", pool_matrix(x.shape[-3], s0, x.dtype), x)
    if x.shape[-2] != s1:
        x = jnp.einsum("tw,...swc->...stc", pool_matrix(x.shape[-2], s1, x.dtype), x)
    return x


# ---------------------------------------------------------------------------
# Patch extraction / pixel shuffle
# ---------------------------------------------------------------------------

def unfold(x: jnp.ndarray, kernel: int, padding: int | None = None,
           stride: int = 1, pad_mode: str = "zeros") -> jnp.ndarray:
    """Extract kernel×kernel patches: ``[..., H, W, C] -> [..., H', W', k*k, C]``.

    Patch positions are row-major over (dy, dx), i.e. output index
    ``p = dy*k + dx`` matches torch ``F.unfold``'s per-channel patch order
    (torch orders [C, k*k]; we expose [k*k, C] — callers index accordingly).
    """
    if padding is None:
        padding = kernel // 2
    nb = x.ndim - 3
    if pad_mode == "zeros":
        xp = jnp.pad(x, [(0, 0)] * nb + [(padding, padding), (padding, padding), (0, 0)])
    elif pad_mode == "reflect":
        xp = jnp.pad(x, [(0, 0)] * nb + [(padding, padding), (padding, padding), (0, 0)],
                     mode="reflect")
    else:
        raise ValueError(pad_mode)
    h, w = x.shape[-3], x.shape[-2]
    out_h = (h + 2 * padding - kernel) // stride + 1
    out_w = (w + 2 * padding - kernel) // stride + 1
    pats = []
    for dy in range(kernel):
        for dx in range(kernel):
            sl = lax.slice_in_dim(lax.slice_in_dim(
                xp, dy, dy + (out_h - 1) * stride + 1, stride, axis=x.ndim - 3),
                dx, dx + (out_w - 1) * stride + 1, stride, axis=x.ndim - 2)
            pats.append(sl)
    return jnp.stack(pats, axis=-2)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Torch ``F.pixel_shuffle``: ``[..., H, W, C*r*r] -> [..., H*r, W*r, C]``.

    Channel c*r*r + dy*r + dx goes to spatial offset (dy, dx) of channel c.
    """
    *b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(*b, h, w, c, r, r)
    x = jnp.moveaxis(x, (-2, -1), (-4, -2))   # [..., h, r, w, r, c]
    return x.reshape(*b, h * r, w * r, c)


# ---------------------------------------------------------------------------
# Coordinate grids and sampling
# ---------------------------------------------------------------------------

def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[H, W, 2]`` grid of (x, y) pixel coordinates (reference
    utils/utils.py:70 stacks (x, y) channel-first; we use channel-last)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def grid_sample(img: jnp.ndarray, coords: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Sample ``img [..., H, W, C]`` at pixel ``coords [..., H', W', 2]`` (x, y).

    Matches torch ``F.grid_sample(align_corners=True, padding_mode='zeros')``
    after the pixel->normalized conversion of reference utils/utils.py:75-88:
    out-of-bounds corners contribute zero.
    """
    h, w = img.shape[-3], img.shape[-2]
    x, y = coords[..., 0], coords[..., 1]

    def gather(iy, ix):
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        flat = img.reshape(*img.shape[:-3], h * w, img.shape[-1])
        idx = iyc * w + ixc
        out = jnp.take_along_axis(
            flat, idx.reshape(*idx.shape[:-2], -1)[..., None], axis=-2)
        out = out.reshape(*idx.shape, img.shape[-1])
        valid = ((iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1))
        return out * valid[..., None].astype(img.dtype)

    if mode == "nearest":
        # torch rounds via (coord + 0.5).floor on the unnormalized grid
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        return gather(iy, ix)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    x1i, y1i = x0i + 1, y0i + 1
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


# ---------------------------------------------------------------------------
# Gradients (forward differences, zero-padded at the far edge)
# ---------------------------------------------------------------------------

def image_gradient(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dx, dy) forward differences with a zero row/col appended, matching
    reference utils/loss_func.py:40-47. ``x`` is ``[..., H, W, C]``."""
    nb = x.ndim - 3
    dy = x[..., 1:, :, :] - x[..., :-1, :, :]
    dx = x[..., :, 1:, :] - x[..., :, :-1, :]
    dy = jnp.pad(dy, [(0, 0)] * nb + [(0, 1), (0, 0), (0, 0)])
    dx = jnp.pad(dx, [(0, 0)] * nb + [(0, 0), (0, 1), (0, 0)])
    return dx, dy


# ---------------------------------------------------------------------------
# Trimap dilation (shape-static, per-sample radius)
# ---------------------------------------------------------------------------

def dilate_by_radius(mask: jnp.ndarray, radius, max_radius: int = 25) -> jnp.ndarray:
    """Binary dilation of ``mask [..., H, W, C]`` with a per-sample Chebyshev
    radius (traced int array broadcastable to the batch dims).

    Equivalent to the reference's per-sample ``max_pool2d(kernel=2r+1,
    pad=r)`` loop (models/model.py:54-64) but shape-static: iterate 3x3 max
    pools, accumulating the result whose iteration count equals each
    sample's radius.

    A static Python-int ``radius`` (the eval path's fixed trimap width,
    pred_vmn.py:70-75) takes a separable two-pass max pool instead — the
    same Chebyshev ball at ~r/2 the cost of the iterated loop.
    """
    if isinstance(radius, int):
        if radius == 0:
            return mask
        k = 2 * radius + 1
        nb = mask.ndim - 3
        neg = (-float("inf") if jnp.issubdtype(mask.dtype, jnp.floating)
               else jnp.iinfo(mask.dtype).min)
        out = lax.reduce_window(
            mask, neg, lax.max, (1,) * nb + (k, 1, 1), (1,) * mask.ndim,
            [(0, 0)] * nb + [(radius, radius), (0, 0), (0, 0)])
        return lax.reduce_window(
            out, neg, lax.max, (1,) * nb + (1, k, 1), (1,) * mask.ndim,
            [(0, 0)] * nb + [(0, 0), (radius, radius), (0, 0)])
    radius = jnp.asarray(radius)
    r = radius.reshape(radius.shape + (1,) * (mask.ndim - radius.ndim))

    def body(i, carry):
        cur, out = carry
        nxt = max_pool(cur, 3, 1, 1)
        out = jnp.where(r == i + 1, nxt, out)
        return nxt, out

    out0 = jnp.where(r == 0, mask, jnp.zeros_like(mask))
    _, out = lax.fori_loop(0, max_radius, body, (mask, out0))
    return out


def reflection_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    nb = x.ndim - 3
    return jnp.pad(x, [(0, 0)] * nb + [(pad, pad), (pad, pad), (0, 0)], mode="reflect")
