"""Fused Pallas TPU kernel for the TAM/FAM windowed cross-frame attention.

One kernel fuses the window^2 shifted dot products, the online softmax,
the weighted neighbor sum, and the unknown-region masking; k's halo tile
is DMA'd from HBM once per (row, col) tile instead of window^2 shifted
HBM reads. This is the hot op of the flagship model (the reference's
per-sample gather loop, models/VMN/VMN_model.py:18-68, does not lower to
TPU at all).

Mosaic layout constraints shape the kernel:
- window shifts are ``pltpu.roll`` on the sublane (W) axis + offset-0
  slices (unaligned sublane slice offsets don't lower);
- tiles are (8k, 8m) in (H, W) with the halo padded to sublane multiples;
  the fused path requires lane-aligned channels (C % 128 == 0) — GCA(128)
  and DIM/FBA(256) take it; Index (32ch) falls back to the XLA path;
- the window^2 loop is a fori_loop with carried online-softmax state
  (an unrolled chain keeps ~window^2 live [th, wt, C] temporaries and
  blows the 16MB VMEM scoped stack);
- logits are written as [B, Hb, Wb, P, th, wt] blocks and rearranged to
  the public ``[B, H, W, P]`` contract outside the kernel.

Training uses jax.custom_vjp with the XLA implementation's gradient
(identical math); inference takes the fused path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcvom_tpu.ops.fam import fam_attention as fam_attention_xla


def _fam_kernel(q_ref, m_ref, kp_ref, out_ref, lg_ref, k_scratch, k_roll,
                sem, *, window: int, tile_h: int, tile_w: int, w_halo: int,
                interpret: bool):
    r = window // 2
    n = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    th, wt, c = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    copy = pltpu.make_async_copy(
        kp_ref.at[n, pl.ds(ti * tile_h, th + 2 * r),
                  pl.ds(tj * tile_w, w_halo)], k_scratch, sem)
    copy.start()

    q = q_ref[0]                        # [th, wt, c]
    m2 = m_ref[0, 0, 0]                 # [th, wt]
    scale = 1.0 / math.sqrt(c)
    copy.wait()

    roll = jnp.roll if interpret else pltpu.roll

    def dx_body(dx, carry):
        # one roll of the whole halo tile per dx; dy then slices the
        # leading (untiled, free) axis of the rolled scratch.
        # left-roll by dx == right-roll by w_halo - dx (shift >= 0);
        # entries [0, wt) read k[j + dx]; no wrap contamination since
        # j + dx <= wt - 1 + 2r < w_halo.
        k_roll[:] = roll(k_scratch[:], w_halo - dx, axis=1)

        def dy_body(dy, carry):
            m_run, d_run, s_run = carry
            ksh = k_roll[pl.ds(dy, th), :wt, :]            # [th, wt, c]
            l_p = jnp.sum(q * ksh, axis=-1) * scale        # [th, wt]
            lg_ref[0, 0, 0, dy * window + dx] = l_p * m2
            m_new = jnp.maximum(m_run, l_p)
            corr = jnp.exp(m_run - m_new)
            e_p = jnp.exp(l_p - m_new)
            d_run = d_run * corr + e_p
            s_run = s_run * corr[:, :, None] + e_p[:, :, None] * ksh
            return m_new, d_run, s_run

        return jax.lax.fori_loop(0, window, dy_body, carry)

    init = (jnp.full((th, wt), -1e30, q.dtype),
            jnp.zeros((th, wt), q.dtype),
            jnp.zeros_like(q))
    _, d_run, s_run = jax.lax.fori_loop(0, window, dx_body, init)

    out_ref[0] = (s_run / d_run[:, :, None]) * m2[:, :, None]


def _pick_tiles(h: int, w: int) -> tuple[int, int] | None:
    """(tile_h, tile_w): multiples of 8 dividing h and w, tile_w <= 128."""
    if h % 8 or w % 8:
        return None
    th = 8
    wt = 8
    for cand in (128, 120, 112, 104, 96, 88, 80, 72, 64, 56, 48, 40, 32, 24, 16, 8):
        if w % cand == 0:
            wt = cand
            break
    return th, wt


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def _fam_pallas_fwd(q, k, mask, window: int, interpret: bool = False):
    b, h, w, c = q.shape
    r = window // 2
    p2 = window * window
    tiles = _pick_tiles(h, w)
    assert tiles is not None, (h, w)
    tile_h, tile_w = tiles
    w_halo = tile_w + -(-2 * r // 8) * 8          # tile + halo, sublane-padded
    kp = jnp.pad(k, [(0, 0), (r, r), (r, w_halo - tile_w - r), (0, 0)])
    hb, wb = h // tile_h, w // tile_w
    # mask as [B, Hb, Wb, th, wt] so its block's minor dim equals the array
    # minor dim (Mosaic lane-alignment rule)
    mask2 = jnp.broadcast_to(mask.astype(q.dtype)[..., 0], (b, h, w))
    mask2 = mask2.reshape(b, hb, tile_h, wb, tile_w).transpose(0, 1, 3, 2, 4)
    kernel = functools.partial(_fam_kernel, window=window, tile_h=tile_h,
                               tile_w=tile_w, w_halo=w_halo,
                               interpret=interpret)
    grid = (b, hb, wb)
    out, lg = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tile_h, tile_w, c), lambda n, t, s: (n, t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_h, tile_w),
                         lambda n, t, s: (n, t, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # kp: full array in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w, c), lambda n, t, s: (n, t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p2, tile_h, tile_w),
                         lambda n, t, s: (n, t, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), q.dtype),
            jax.ShapeDtypeStruct((b, hb, wb, p2, tile_h, tile_w), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * r, w_halo, c), q.dtype),
            pltpu.VMEM((tile_h + 2 * r, w_halo, c), q.dtype),  # rolled copy
            pltpu.SemaphoreType.DMA,
        ],
    )(q, mask2, kp)
    # [B, Hb, Wb, P, th, wt] -> [B, H, W, P]
    lg = jnp.transpose(lg, (0, 1, 4, 2, 5, 3)).reshape(b, h, w, p2)
    return out, lg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fam_attention_fused(q, k, mask, window: int):
    """Same contract as ops.fam.fam_attention, fused on TPU. Differentiable
    (backward runs the XLA formulation's VJP)."""
    return _fam_pallas_fwd(q, k, mask, window)


def _fwd(q, k, mask, window):
    out = _fam_pallas_fwd(q, k, mask, window)
    return out, (q, k, mask)


def _bwd(window, residuals, cts):
    q, k, mask = residuals
    _, vjp = jax.vjp(lambda q_, k_: fam_attention_xla(q_, k_, mask, window),
                     q, k)
    dq, dk = vjp(cts)
    return dq, dk, None


fam_attention_fused.defvjp(_fwd, _bwd)


def fam_attention(q, k, mask, window: int, use_pallas: bool | None = None):
    """Dispatch: fused Pallas kernel on TPU when the layout allows
    (C % 128 == 0, H and W multiples of 8), XLA formulation otherwise.

    TODO(perf): at large (1080p OS=8) grids the VPU-bound kernel currently
    ties/loses to XLA's fusion; reformulate the window dots + reconstruction
    as banded MXU matmuls per row to beat it, then widen this dispatch.
    """
    h, w, c = q.shape[-3], q.shape[-2], q.shape[-1]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and c % 128 == 0 and h * w <= 64 * 64
                      and _pick_tiles(h, w) is not None)
    if use_pallas:
        return fam_attention_fused(q, k, mask, window)
    return fam_attention_xla(q, k, mask, window)
