"""Pallas TPU kernel for the EDT row pass (the parabolic min-plus).

The squared-EDT row pass ``out[r, j] = min_{|d| <= T} (g2[r, j+d] + d^2)``
is the hot half of the on-device distance transform
(tcvom_tpu/ops/distance.py; the reference instead round-trips every frame
to OpenCV on the CPU, utils/utils.py:12-23). The XLA formulation is a
chunked broadcast+min-reduce that re-streams its candidate windows from
HBM — profiled 5.3 ms/frame-pair at 1080p, ~1.6 GB of traffic for a
17 MB tensor. The kernel keeps each row tile in VMEM and re-uses it for
every offset, so HBM traffic drops to one read + one write and the op
runs at the VPU's min-add rate.

Layout: W on the SUBLANE axis, rows on lanes (the kernel consumes the
transposed ``[W, R]`` view; unaligned LANE slices don't lower on TPU and
sublane slices must sit on 8-row tiles). Shifted windows are read from 8
phase-rolled copies of the tile so every slice lands on an aligned
sublane offset; the +-d candidate pair shares its d^2 add:

    acc = min(acc, min(roll_b1[m1], roll_b2[m2]) + d*d)

All values stay f32 and below 2^24 (g2 is capped at 1e7, d^2 <= 65536),
so the kernel is bit-exact against the XLA path — pinned by
tests/test_distance_metrics.py and the on-chip TPUCHECK edt row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e7
R_TILE = 128          # rows per block (the lane axis)
W_TILE = 960          # output columns per block (the sublane axis)


def _edt_row_kernel(g_hbm, out_ref, scratch, sem, *, trunc: int,
                    w_tile: int, interpret: bool):
    iw = pl.program_id(0)
    ir = pl.program_id(1)
    copy = pltpu.make_async_copy(
        g_hbm.at[pl.ds(iw * w_tile, w_tile + 2 * trunc),
                 pl.ds(ir * R_TILE, R_TILE)], scratch, sem)
    copy.start()
    copy.wait()
    g = scratch[:]                           # [w_tile + 2T, R_TILE]
    # 8 phase-rolled copies: phase[b][i] = g[i + b], so g[8m + b + t] is
    # the sublane-aligned slice phase[b][8m + t] for any output span t.
    # pltpu.roll rejects negative shifts, so the left-roll by b is
    # expressed as the equivalent positive roll by (n - b).
    n = g.shape[0]
    roll = jnp.roll if interpret else pltpu.roll
    phases = [g] + [roll(g, shift=n - b, axis=0) for b in range(1, 8)]

    acc = g[trunc:trunc + w_tile]            # d = 0 candidate (T % 8 == 0)
    for d in range(1, trunc + 1):
        lo, hi = trunc - d, trunc + d
        lo0, hi0 = lo - lo % 8, hi - hi % 8
        cand_lo = phases[lo % 8][lo0:lo0 + w_tile]
        cand_hi = phases[hi % 8][hi0:hi0 + w_tile]
        acc = jnp.minimum(acc, jnp.minimum(cand_lo, cand_hi)
                          + jnp.float32(d * d))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("trunc", "interpret"))
def edt_row_pass_fused(g2: jnp.ndarray, trunc: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """``out[r, j] = min_{|d| <= trunc} (g2[r, j + d] + d^2)`` (out-of-range
    j+d contribute nothing). ``g2``: f32 ``[R, W]``. ``trunc`` must be a
    multiple of 8 (sublane tile)."""
    assert trunc % 8 == 0, trunc
    r, w = g2.shape
    wp = -w % W_TILE if w > W_TILE else -w % 8
    w_tile = min(w + wp, W_TILE)
    # pad W with BIG halos (both the truncation apron and the tile rounding)
    # and R to the lane tile
    rp = -r % R_TILE
    gt = jnp.pad(g2.T, ((trunc, trunc + wp), (0, rp)), constant_values=_BIG)
    nw = (w + wp) // w_tile
    out = pl.pallas_call(
        functools.partial(_edt_row_kernel, trunc=trunc, w_tile=w_tile,
                          interpret=interpret),
        grid=(nw, (r + rp) // R_TILE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((w_tile, R_TILE),
                               lambda iw, ir: (iw, ir),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w + wp, r + rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w_tile + 2 * trunc, R_TILE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(gt)
    return out[:w, :r].T
