"""Subpixel (space-to-depth) re-layout of upsample+conv decoder stages.

Why: the FBA-style decoder tail runs 3x3 convs at OS=2 and OS=1 with 8-72
channels. On TPU, NHWC tensors put channels on the 128-lane axis, so a
16-channel conv at 1088x1920 wastes ~90% of the VPU/MXU and every bilinear
2x upsample is a full-tensor interleave relayout; measured on v5e the
reference-shaped tail costs ~42 ms/frame against a ~4 ms FLOP roofline
(tools/profile_stream.py, tools/bench_fam.py harness).

The re-layout: keep OS=2 tensors as ``[H/2, W/2, 4C]`` and OS=1 tensors as
``[H/2, W/2, 4C]`` blocks over the coarser grid (phase-major channel order
``(py*2 + px)*C + c``), and transform the *weights* instead of the
activations:

- ``conv3x3 o upsample2x``      -> one 3x3 conv on the coarse grid with a
  composed kernel (``compose_up_conv_kernel``), or a stride-1 quarter-grid
  conv when the input is 4-packed and the output 16-packed
  (``up_conv_16_kernel`` — the lhs-dilated 2x2-packed composite made XLA
  materialize zero-stuffed inputs, see the 16-pack section below)
- ``conv3x3`` over a same-resolution skip input -> a 4x4 stride-2 conv
  (``stride2_conv_kernel``)
- ``conv3x3`` with both input and output block-packed -> a 3x3 conv with a
  phase-structured kernel (``rep_conv_kernel``); 1x1 -> block-diagonal 1x1
  (``rep_1x1_kernel``)
- GroupNorm over block-packed channels -> per-phase-channel spatial
  moments regrouped into the original groups (``group_norm_s2d``)

All transforms are exact re-associations of the same arithmetic — the
parameters (and checkpoints) are unchanged; kernels are transformed at
trace time (tiny tensors). Interior pixels are bit-comparable to the
reference formulation; image borders differ because the upsample's edge
clamp and the conv's zero padding do not commute with the composition, so
the decoder recomputes a thin border ring with the reference-shaped path
and stitches it in (see models/fba.py).

Upsample convention: half-pixel-centers bilinear 2x (torch
``F.interpolate(scale_factor=2, align_corners=False)``):
``out[2a] = 0.25 in[a-1] + 0.75 in[a]``, ``out[2a+1] = 0.75 in[a] +
0.25 in[a+1]``, clamped at the edges.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# A[p, 1+d, 1+u]: weight of h[i+u] inside up(h)[2i+p+d] for an output phase
# p in {0,1} and a following conv tap d in {-1,0,1}
_A = np.zeros((2, 3, 3), np.float32)
for _p in (0, 1):
    for _d in (-1, 0, 1):
        _e = _p + _d
        _taps = {-1: {-1: 0.75, 0: 0.25}, 0: {-1: 0.25, 0: 0.75},
                 1: {0: 0.75, 1: 0.25}, 2: {0: 0.25, 1: 0.75}}[_e]
        for _u, _a in _taps.items():
            _A[_p, 1 + _d, 1 + _u] = _a

_A_j = jnp.asarray(_A)


import functools


# NB: cache numpy (not jnp) — a jnp constant created inside a trace would
# be a tracer and leak across jit scopes through the cache
@functools.lru_cache(maxsize=None)
def _s2d_eye_np(c: int):
    eye = np.zeros((2, 2, c, 4 * c), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            p = py * 2 + px
            eye[py, px, np.arange(c), p * c + np.arange(c)] = 1.0
    return eye


@functools.lru_cache(maxsize=None)
def _d2s_eye_np(c: int):
    # transposed-conv form: kernel position is spatially flipped
    eye = np.zeros((2, 2, 4 * c, c), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            p = py * 2 + px
            eye[1 - py, 1 - px, p * c + np.arange(c), np.arange(c)] = 1.0
    return eye


def _conv_layout_ok(x):
    """Identity-conv re-layout: free on TPU (a reshape-transpose relayout
    costs ~3 ms on a 128 MB tensor; the MXU identity conv is ~0). Only for
    bf16 — a TPU conv pass would round f32 values to bf16."""
    return x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _s2d_wfold_eye_np(c: int):
    # maps W-folded channels (px*C + c) at row phase py to s2d block order
    eye = np.zeros((2, 1, 2 * c, 4 * c), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            eye[py, 0, px * c + np.arange(c),
                (py * 2 + px) * c + np.arange(c)] = 1.0
    return eye


def s2d(x, prefer_reshape: bool = False):
    """[N, H, W, C] -> [N, H/2, W/2, 4C], channel (py*2+px)*C + c.

    Thin-channel inputs go through a free W-fold reshape ([..., W, C] ->
    [..., W/2, 2C] is contiguous) + a (2,1)-stride identity conv — ~1.6x
    the plain 2x2 identity conv on full-res thin tensors (bit-exact).
    ``prefer_reshape`` forces the reshape-transpose path."""
    n, h, w, c = x.shape
    if _conv_layout_ok(x) and not prefer_reshape:
        if c <= 16:
            xw = x.reshape(n, h, w // 2, 2 * c)
            return lax.conv_general_dilated(
                xw, jnp.asarray(_s2d_wfold_eye_np(c), x.dtype), (2, 1),
                [(0, 0), (0, 0)], dimension_numbers=_DN)
        return lax.conv_general_dilated(
            x, jnp.asarray(_s2d_eye_np(c), x.dtype), (2, 2),
            [(0, 0), (0, 0)], dimension_numbers=_DN)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s(x, prefer_reshape: bool = False):
    """[N, H, W, 4C] -> [N, 2H, 2W, C], inverse of :func:`s2d`.
    ``prefer_reshape`` forces the reshape-transpose path (the identity
    conv uses lhs dilation, which XLA may lower through a zero-stuffed
    materialization of the input)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    if _conv_layout_ok(x) and not prefer_reshape:
        return lax.conv_general_dilated(
            x, jnp.asarray(_d2s_eye_np(c), x.dtype), (1, 1), [(1, 1), (1, 1)],
            lhs_dilation=(2, 2), dimension_numbers=_DN)
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def compose_up_conv_kernel(w):
    """[3,3,I,O] -> [3,3,I,4O]: kernel of (conv3x3 o upsample2x) evaluated
    on the pre-upsample grid, output block-packed. Apply to the input
    edge-padded by 1 (reproduces the upsample's edge clamp) with VALID
    padding; the 1-px output ring still differs from the reference (the
    conv's zero padding), see module docstring."""
    # K[u, v, i, (py, px, o)] = sum_{a,b} w[a,b,i,o] A[py,a,u] A[px,b,v]
    k = jnp.einsum("abio,pau,qbv->uvipqo", w, _A_j.astype(w.dtype),
                   _A_j.astype(w.dtype))
    kh, kw, i = k.shape[0], k.shape[1], k.shape[2]
    return k.reshape(kh, kw, i, 4 * w.shape[-1])


# selection tensors for the scatter-style kernel transforms — one einsum
# against a constant instead of hundreds of tiny dynamic-update-slice ops
# (which execute as sequential micro-kernels and cost ~8 ms/call at trace
# level). S2[t, r, a] = 1 iff tap a (= 1+dy) lands at kernel position t
# for output phase r in a stride-2 packing; SR[s, q, r, a] likewise for a
# packed-input/packed-output 3x3 conv.
_S2 = np.zeros((4, 2, 3), np.float32)
for _t in range(4):
    for _r in (0, 1):
        _d = _t - 1 - _r
        if -1 <= _d <= 1:
            _S2[_t, _r, 1 + _d] = 1.0
_SR = np.zeros((3, 2, 2, 3), np.float32)
for _s in (-1, 0, 1):
    for _q in (0, 1):
        for _r in (0, 1):
            _d = 2 * _s + _q - _r
            if -1 <= _d <= 1:
                _SR[1 + _s, _q, _r, 1 + _d] = 1.0
# same for a 5x5 conv: dy = 2s + q - r in [-2, 2] still fits in a 3x3
# packed kernel (DIM's 5x5 decoder convs)
_SR5 = np.zeros((3, 2, 2, 5), np.float32)
for _s in (-1, 0, 1):
    for _q in (0, 1):
        for _r in (0, 1):
            _d = 2 * _s + _q - _r
            if -2 <= _d <= 2:
                _SR5[1 + _s, _q, _r, 2 + _d] = 1.0
_S2_j = jnp.asarray(_S2)
_SR_j = jnp.asarray(_SR)
_SR5_j = jnp.asarray(_SR5)


def stride2_conv_kernel(w):
    """[3,3,I,O] -> [4,4,I,4O]: a 3x3 conv whose output is block-packed
    over the half grid, taking the input at its native (full) resolution.
    Use with ``window_strides=(2,2), padding=[(1,1),(1,1)]``. Exact
    including borders (zero padding commutes)."""
    i, o = w.shape[2], w.shape[3]
    s2 = _S2_j.astype(w.dtype)
    k = jnp.einsum("abio,tra,usb->tuirso", w, s2, s2)
    return k.reshape(4, 4, i, 4 * o)


def rep_conv_kernel(w):
    """[3,3,I,O] -> [3,3,4I,4O]: 3x3 conv with both input and output
    block-packed over the half grid. Use with ``padding=[(1,1),(1,1)]``.
    Exact including borders."""
    i, o = w.shape[2], w.shape[3]
    sr = _SR_j.astype(w.dtype)
    k = jnp.einsum("abio,sqra,tnub->stqniruo", w, sr, sr)
    return k.reshape(3, 3, 4 * i, 4 * o)


def rep_conv5_kernel(w):
    """[5,5,I,O] -> [3,3,4I,4O]: 5x5 conv with both input and output
    block-packed over the half grid — the +-2 taps still land within one
    neighboring cell, so a 3x3 packed kernel covers them. Exact including
    borders. (DIM's 5x5 decoder convs, reference models/DIM/vggnet.py.)"""
    i, o = w.shape[2], w.shape[3]
    sr = _SR5_j.astype(w.dtype)
    k = jnp.einsum("abio,sqra,tnub->stqniruo", w, sr, sr)
    return k.reshape(3, 3, 4 * i, 4 * o)


def unpool_to_phases(x, idx):
    """MaxUnpool2x2 in block-packed form: scatter each value into its
    recorded in-window phase — [N,h,w,C] + per-channel idx [N,h,w,C] in
    [0,4) -> [N,h,w,4C] over the same grid (the unpacked result would be
    the [2h,2w,C] torch MaxUnpool output; here the interleave never
    happens). Exact — unpool has no cross-pixel taps."""
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=-2)   # [N,h,w,4,C]
    out = onehot * x[..., None, :]
    return out.reshape(x.shape[:-1] + (4 * x.shape[-1],))


# 3x3 stride-2 conv consuming a block-packed input, natural output:
# tap t = 2(s-1) + q + 1 for packed kernel position s in {0,1}
_S3P = np.zeros((2, 2, 3), np.float32)
for _s in (0, 1):
    for _q in (0, 1):
        _t = 2 * (_s - 1) + _q + 1
        if 0 <= _t <= 2:
            _S3P[_s, _q, _t] = 1.0
_S3P_j = jnp.asarray(_S3P)

# 3x3 stride-2 conv consuming a block-packed input AND producing a
# block-packed output (stride 2 over packed cells):
# tap d = 2s + q - 2r + 1 for packed kernel position 1+s, s in {-1..2}
_S3PP = np.zeros((4, 2, 2, 3), np.float32)
for _s in (-1, 0, 1, 2):
    for _q in (0, 1):
        for _r in (0, 1):
            _d = 2 * _s + _q - 2 * _r + 1
            if 0 <= _d <= 2:
                _S3PP[1 + _s, _q, _r, _d] = 1.0
_S3PP_j = jnp.asarray(_S3PP)

# torch ConvTranspose2d(k=4, s=2, p=1) producing a block-packed output:
# out[2i+r] = sum_a K[(2i+r) - 2a + 1] x[a] (kernel tap index in [0,4));
# with s = a - i in {-1, 0, 1}: tap = r - 2s + 1
_T4P = np.zeros((3, 2, 4), np.float32)
for _s in (-1, 0, 1):
    for _r in (0, 1):
        _t = _r - 2 * _s + 1
        if 0 <= _t <= 3:
            _T4P[1 + _s, _r, _t] = 1.0
_T4P_j = jnp.asarray(_T4P)


def s2_from_packed_kernel3(w):
    """[3,3,I,O] -> [2,2,4I,O]: a 3x3 stride-2 conv whose input is
    block-packed over the half grid; output at the natural (half) grid.
    Use with ``padding=[(1,0),(1,0)]``. Exact including borders."""
    i, o = w.shape[2], w.shape[3]
    s = _S3P_j.astype(w.dtype)
    k = jnp.einsum("abio,sqa,tnb->stqnio", w, s, s)
    return k.reshape(2, 2, 4 * i, o)


def s2_packed_out_kernel3(w):
    """[3,3,I,O] -> [4,4,4I,4O]: a 3x3 stride-2 conv with block-packed
    input AND block-packed output (i.e. OS doubles while staying on the
    same packed grid). Use with ``window_strides=(2,2),
    padding=[(1,1),(1,1)]``. Exact including borders."""
    i, o = w.shape[2], w.shape[3]
    s = _S3PP_j.astype(w.dtype)
    k = jnp.einsum("abio,sqra,tnub->stqniruo", w, s, s)
    return k.reshape(4, 4, 4 * i, 4 * o)


def convT4_packed_out_kernel(w):
    """[4,4,I,O] (torch ConvTranspose2d(4,2,1) HWIO layout) ->
    [3,3,I,4O]: the transposed conv as a plain 3x3 conv on the input grid
    with block-packed output. Use with ``padding=[(1,1),(1,1)]``. Exact
    including borders (out-of-range input taps are zero on both sides)."""
    i, o = w.shape[2], w.shape[3]
    t = _T4P_j.astype(w.dtype)
    k = jnp.einsum("abio,sra,unb->suirno", w, t, t)
    return k.reshape(3, 3, i, 4 * o)


# stem selection: S7[s, q, t] = 1 iff 7-kernel tap t feeds packed-input
# kernel position s for input phase q in a stride-2 conv consuming a
# block-packed input (t = 2(s-2) + q + 3)
_S7 = np.zeros((4, 2, 7), np.float32)
for _s in range(4):
    for _q in (0, 1):
        _t = 2 * (_s - 2) + _q + 3
        if 0 <= _t <= 6:
            _S7[_s, _q, _t] = 1.0
_S7_j = jnp.asarray(_S7)


def stem7_s2_packed_kernel(w):
    """[7,7,I,O] -> [4,4,4I,O]: a 7x7 stride-2 conv re-expressed on the
    block-packed input (4I channels on the half grid, stride 1). Use with
    ``padding=[(2,1),(2,1)]``. Exact including borders (the original
    pad-3 zeros map onto the packed zero padding). The TPU-shaped form of
    a small-channel stem (FBA's 11-channel conv1 measured 3.4 -> 1.75 ms
    at 1080p)."""
    i, o = w.shape[2], w.shape[3]
    s7 = _S7_j.astype(w.dtype)
    k = jnp.einsum("abco,sqa,tnb->stqnco", w, s7, s7)
    return k.reshape(4, 4, 4 * i, o)


def rep_1x1_kernel(w):
    """[1,1,I,O] -> [1,1,4I,4O] block-diagonal over phases. Exact."""
    i, o = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("io,pq->piqo", w[0, 0], eye)
    return k.reshape(1, 1, 4 * i, 4 * o)


def tile_bias(b):
    """[O] -> [4O] matching the phase-major channel order."""
    return jnp.tile(b, 4)


def group_norm_s2d_stats(x, scale, bias, num_groups: int = 32,
                         eps: float = 1e-5):
    """GroupNorm statistics over block-packed channels: taken over
    (H, W, phases, group channels) — identical math to GroupNorm on the
    unpacked tensor. Returns per-real-channel affine ``(mul, add)`` of
    shape [N, C] such that ``y = x*mul + add`` — reusable for normalizing
    border strips computed in the unpacked layout with the same (global)
    statistics. ``scale``/``bias``: [C]."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    xf = x.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=(1, 2))                       # [N, 4C]
    m2 = jnp.mean(xf * xf, axis=(1, 2))
    g = c // num_groups
    gm1 = m1.reshape(n, 4, num_groups, g).mean(axis=(1, 3))   # [N, G]
    gm2 = m2.reshape(n, 4, num_groups, g).mean(axis=(1, 3))
    var = gm2 - gm1 * gm1
    inv = jax.lax.rsqrt(var + eps)                        # [N, G]
    mu_c = jnp.repeat(gm1, g, axis=1)                     # [N, C]
    inv_c = jnp.repeat(inv, g, axis=1)
    mul = inv_c * scale[None].astype(jnp.float32)
    add = bias[None].astype(jnp.float32) - mu_c * mul
    return mul, add


def apply_norm_stats(x, mul, add):
    """Apply per-channel affine stats ([N, C]) to an unpacked [N,h,w,C]."""
    return (x.astype(jnp.float32) * mul[:, None, None, :]
            + add[:, None, None, :]).astype(x.dtype)


def group_norm_s2d(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm on a block-packed [N,h,w,4C] tensor (see the stats fn)."""
    mul, add = group_norm_s2d_stats(x, scale, bias, num_groups, eps)
    mul4 = jnp.tile(mul, (1, 4))[:, None, None, :]
    add4 = jnp.tile(add, (1, 4))[:, None, None, :]
    return (x.astype(jnp.float32) * mul4 + add4).astype(x.dtype)


# ---------------------------------------------------------------------------
# conv wrappers (functional, torch-padding semantics)
# ---------------------------------------------------------------------------

def conv2d(x, kernel, *, stride: int = 1, padding=0, lhs_dilation=None,
           groups: int = 1):
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=pad, lhs_dilation=lhs_dilation, dimension_numbers=_DN,
        feature_group_count=groups)


def up_conv(h, w3, bias=None):
    """(conv3x3 zero-pad o upsample2x clamped)(h), output block-packed on
    h's grid. Interior-exact; the 1-px output ring approximates the
    composite's true border behavior (callers stitch the ring, so the pad
    kind only affects stitched-over values). Zero padding INSIDE the conv
    instead of a materialized edge-clamp pad: the explicit jnp.pad copy
    measured 0.4-0.8 ms per call at 1080p (PROFILE pad.30/fusion.66 rows)
    while conv padding is free."""
    y = conv2d(h, compose_up_conv_kernel(w3), padding=1)
    return y if bias is None else y + tile_bias(bias).astype(y.dtype)


# ---------------------------------------------------------------------------
# 4x4 ("16-pack") block packing — OS=1 decoder stages on the quarter grid
#
# The 2x2 packing still leaves OS=1 stages with 32-128 channels on a
# [H/2, W/2] grid, where XLA's lowering of the lhs-dilated composite
# kernels materializes zero-stuffed inputs (measured 130-140 MB pads per
# conv in the 1080p FBA tail). Packing 4x4 blocks puts the whole tail on
# the [H/4, W/4] grid with 128-512 channels — every conv is a plain
# stride-1 NHWC conv with a full 128-lane minor dim and no input
# dilation. Channel order matches s2d(s2d(x)):
#     channel = blk(py, px) * C + c,   (py, px) = full-res position mod 4,
#     blk(py, px) = (py//2 * 2 + px//2) * 4 + (py%2 * 2 + px%2)
# so ``d2s(d2s(.))`` unpacks it and all transforms below are exact
# re-associations of the same arithmetic (same parameters).
# ---------------------------------------------------------------------------

def _blk(py: int, px: int) -> int:
    return (py // 2 * 2 + px // 2) * 4 + (py % 2 * 2 + px % 2)


# raster index (py*4 + px) of each s2d∘s2d block, for reordering the
# (py, px)-raster phase axes produced by the einsums below
_BLK2RASTER = np.zeros(16, np.int64)
for _B in range(16):
    _y2, _x2 = (_B // 4) // 2, (_B // 4) % 2
    _y1, _x1 = (_B % 4) // 2, (_B % 4) % 2
    _BLK2RASTER[_B] = (2 * _y2 + _y1) * 4 + (2 * _x2 + _x1)

# R16[1+s, t, p, 1+d] = 1 iff full-res tap p+d lands in quarter cell s at
# in-cell position t (4s + t == p + d); p, t in 0..3, s, d in -1..1
_R16 = np.zeros((3, 4, 4, 3), np.float32)
for _s in (-1, 0, 1):
    for _t in range(4):
        for _p in range(4):
            _d = 4 * _s + _t - _p
            if -1 <= _d <= 1:
                _R16[1 + _s, _t, _p, 1 + _d] = 1.0

# W16[p, 1+s, t, 1+d] = weight of the OS=2 value at quarter cell offset s,
# in-cell position t, inside (conv tap d ∘ upsample2x) for full-res output
# phase p: the OS=2 input index is y//2 + u with u = 2s + t - p//2, and the
# interior upsample weight is _A[p%2, 1+d, 1+u]
_W16 = np.zeros((4, 3, 2, 3), np.float32)
for _p in range(4):
    for _s in (-1, 0, 1):
        for _t in (0, 1):
            _u = 2 * _s + _t - _p // 2
            if -1 <= _u <= 1:
                for _d in (-1, 0, 1):
                    _W16[_p, 1 + _s, _t, 1 + _d] = _A[_p % 2, 1 + _d, 1 + _u]

_R16_j = jnp.asarray(_R16)
_W16_j = jnp.asarray(_W16)


def _take_blocks(k, axis: int, inner: int):
    """Reorder a kernel axis laid out as (py*4+px)-raster blocks of size
    ``inner`` into the s2d∘s2d block order."""
    shape = k.shape
    k = k.reshape(shape[:axis] + (16, inner) + shape[axis + 1:])
    k = jnp.take(k, jnp.asarray(_BLK2RASTER), axis=axis)
    return k.reshape(shape)


@functools.lru_cache(maxsize=None)
def _s4d_eye_np(c: int):
    eye = np.zeros((4, 4, c, 16 * c), np.float32)
    for py in range(4):
        for px in range(4):
            eye[py, px, np.arange(c), _blk(py, px) * c + np.arange(c)] = 1.0
    return eye


@functools.lru_cache(maxsize=None)
def _s4d_wfold_eye_np(c: int):
    # maps W-folded channels (px*C + c) at row phase py to s4d block order
    eye = np.zeros((4, 1, 4 * c, 16 * c), np.float32)
    for py in range(4):
        for px in range(4):
            eye[py, 0, px * c + np.arange(c),
                _blk(py, px) * c + np.arange(c)] = 1.0
    return eye


def s4d(x, prefer_reshape: bool = False):
    """[N, H, W, C] -> [N, H/4, W/4, 16C] == s2d(s2d(x)). The identity-conv
    path relayouts through the MXU (thin-channel inputs via a free W-fold
    reshape + (4,1)-stride conv — the 4x4 identity conv pays thin-lane
    reads 4x over, and the reshape-transpose path runs at ~5 GB/s);
    ``prefer_reshape`` forces the reshape-transpose path."""
    n, h, w, c = x.shape
    if _conv_layout_ok(x) and not prefer_reshape:
        if c <= 16:
            xw = x.reshape(n, h, w // 4, 4 * c)
            return lax.conv_general_dilated(
                xw, jnp.asarray(_s4d_wfold_eye_np(c), x.dtype), (4, 1),
                [(0, 0), (0, 0)], dimension_numbers=_DN)
        return lax.conv_general_dilated(
            x, jnp.asarray(_s4d_eye_np(c), x.dtype), (4, 4),
            [(0, 0), (0, 0)], dimension_numbers=_DN)
    x = x.reshape(n, h // 4, 2, 2, w // 4, 2, 2, c)
    #             0    1     2  3    4     5  6  7   (y2, y1) (x2, x1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)       # [N,h,w,y2,x2,y1,x1,C]
    return x.reshape(n, h // 4, w // 4, 16 * c)


def d4s(x, prefer_reshape: bool = False):
    """[N, H, W, 16C] -> [N, 4H, 4W, C], inverse of :func:`s4d`."""
    n, h, w, c16 = x.shape
    c = c16 // 16
    if _conv_layout_ok(x) and not prefer_reshape:
        return d2s(d2s(x))
    x = x.reshape(n, h, w, 2, 2, 2, 2, c)          # [..., y2, x2, y1, x1, C]
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)        # [N,h,y2,y1,w,x2,x1,C]
    return x.reshape(n, 4 * h, 4 * w, c)


# nested s4d channel (y2,x2,y1,x1) feeding each flat (py*4+px) slot — the
# static gather re-orders phases so the spatial unpack below is ONE
# [h,w,4,4]->[h,4,w,4] transpose instead of the nested 2x2x2x2 shuffle
_D4S_FLAT_PERM = np.array(
    [(py // 2 * 2 + px // 2) * 4 + (py % 2 * 2 + px % 2)
     for py in range(4) for px in range(4)], np.int32)


def d4s_flat(x):
    """[N, H, W, 16] (s4d order) -> [N, 4H, 4W]: single-channel
    :func:`d4s` without the trailing unit dim. A [..., 1] full-res tensor
    tiles (W, 1) on TPU — 1 of 128 lanes live — so unpacking alpha through
    d4s and squeezing costs two degenerate-layout copies (measured
    0.77 + 0.87 ms f32 at 1080p, PROFILE_r05 copy.1175/squeeze.6). This
    emits the W-minor [N, H, W] form via a static phase gather (which XLA
    fuses into the producer — e.g. the u8 quantize in the streaming matte
    path) + one flat transpose: 0.36 ms vs 1.70 ms for the direct nested
    transpose at 1080p u8 (r05 microbench, perm fused)."""
    n, h, w, c16 = x.shape
    assert c16 == 16, c16
    x = x[..., jnp.asarray(_D4S_FLAT_PERM)]
    x = x.reshape(n, h, w, 4, 4)                  # [..., py, px]
    x = x.transpose(0, 1, 3, 2, 4)                # [n, h, py, w, px]
    return x.reshape(n, 4 * h, 4 * w)


def s2d_parts(parts):
    """Pack a channel-concat ``concat(parts, -1)`` in 2x2 block form
    WITHOUT materializing the full-resolution concat — the 4-pack analog
    of :func:`s4d_parts` (thin parts take s2d's free W-fold + (2,1)-stride
    identity conv). Returns ``(packed, row_perm)``; ``row_perm`` reorders
    the input-channel rows of any kernel built for ``s2d(concat(parts))``
    channel order so it consumes ``packed`` directly."""
    packed = jnp.concatenate([s2d(p) for p in parts], axis=-1)
    sizes = [p.shape[-1] for p in parts]
    ctot = sum(sizes)
    perm, off = [], 0
    for csz in sizes:
        for blk in range(4):
            perm.extend(blk * ctot + off + j for j in range(csz))
        off += csz
    return packed, np.asarray(perm, np.int64)


def s4d_parts(parts, prefer_reshape: bool = False):
    """Pack a channel-concat ``concat(parts, -1)`` in 16-pack form WITHOUT
    materializing the full-resolution concat (an 8-channel 1080p concat
    measured 6.1 ms — the thin-channel C-minor layout is 16x lane-padded).

    Packing goes through the MXU identity conv where the layout allows
    (bf16 on TPU): the reshape-transpose path runs at ~5 GB/s on thin
    full-res tensors (measured 6.7/4.3 ms per 3/2-channel 1080p part vs
    1.6/1.0 ms for the identity conv — PROFILE_r03.md).

    Returns ``(packed, row_perm)``: ``packed`` is the part-major
    concatenation of per-part s4d packings, and ``row_perm`` reorders the
    input-channel rows of any kernel built for ``s4d(concat(parts))``
    channel order so it consumes ``packed`` directly (permute the tiny
    kernel at trace time, never the activation)."""
    packed = jnp.concatenate(
        [s4d(p, prefer_reshape=prefer_reshape) for p in parts], axis=-1)
    sizes = [p.shape[-1] for p in parts]
    ctot = sum(sizes)
    perm, off = [], 0
    for csz in sizes:
        for blk in range(16):
            perm.extend(blk * ctot + off + j for j in range(csz))
        off += csz
    return packed, np.asarray(perm, np.int64)


def rep16_conv_kernel(w):
    """[3,3,I,O] -> [3,3,16I,16O]: a 3x3 full-res conv with both input and
    output 16-block-packed over the quarter grid. Use with
    ``padding=[(1,1),(1,1)]``. Exact including borders (the quarter-grid
    zero padding covers every out-of-image full-res tap)."""
    i, o = w.shape[2], w.shape[3]
    r = _R16_j.astype(w.dtype)
    k = jnp.einsum("abio,stpa,unqb->sutnipqo", w, r, r)
    k = k.reshape(3, 3, 16 * i, 16 * o)
    k = _take_blocks(k, 2, i)
    return _take_blocks(k, 3, o)


def up_conv_16_kernel(w):
    """[3,3,I,O] -> [3,3,4I,16O]: (conv3x3 zero-pad ∘ upsample2x) taking a
    4-block-packed OS=2 input on the quarter grid to a 16-block-packed
    OS=1 output on the same grid. Use with ``padding=[(1,1),(1,1)]``.
    Border ring approximate (the upsample's edge clamp and the conv's
    zero padding both become zeros) — callers stitch the ring."""
    i, o = w.shape[2], w.shape[3]
    wsel = _W16_j.astype(w.dtype)
    k = jnp.einsum("abio,psta,qunb->sutnipqo", w, wsel, wsel)
    k = k.reshape(3, 3, 4 * i, 16 * o)
    return _take_blocks(k, 3, o)


def rep16_1x1_kernel(w):
    """[1,1,I,O] -> [1,1,16I,16O] block-diagonal over phases. Exact."""
    i, o = w.shape[2], w.shape[3]
    eye = jnp.eye(16, dtype=w.dtype)
    k = jnp.einsum("io,pq->piqo", w[0, 0], eye)
    return k.reshape(1, 1, 16 * i, 16 * o)


def tile_bias16(b):
    """[O] -> [16O] matching the 16-pack channel order."""
    return jnp.tile(b, 16)
