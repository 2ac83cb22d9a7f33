"""Fused Pallas TPU kernel for the TAM/FAM windowed cross-frame attention.

One kernel fuses the window^2 shifted dot products, the softmax, the
weighted neighbor sum, and the unknown-region masking; k's halo tile is
DMA'd from HBM once per row-tile instead of window^2 shifted HBM reads.
This is the hot op of the flagship model (the reference's per-sample
gather loop, models/VMN/VMN_model.py:18-68, does not lower to TPU at all).

Layout notes (Mosaic): all window shifts are expressed as ``pltpu.roll``
on the sublane (W) axis followed by offset-0 slices — unaligned sublane
slice offsets crash the Mosaic lowering. Logits are produced in a
``[B, P, H, W]`` layout (P on an untiled leading axis) and transposed to
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


def _fam_kernel(q_ref, m_ref, kp_ref, out_ref, lg_ref, k_scratch, sem, *,
                window: int, tile_h: int):
    r = window // 2
    n = pl.program_id(0)
    ti = pl.program_id(1)
    th, w, c = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    copy = pltpu.make_async_copy(
        kp_ref.at[n, pl.ds(ti * tile_h, th + 2 * r)], k_scratch, sem)
    copy.start()

    q = q_ref[0]                        # [th, w, c]
    m3 = m_ref[0]                       # [th, w, 1]
    m2 = m_ref[0, :, :, 0]              # [th, w]
    scale = 1.0 / math.sqrt(c)
    copy.wait()

    def shifted(dy: int, dx: int):
        kw = k_scratch[dy:dy + th]      # [th, w + 2r, c]
        if dx:
            # left-roll by dx == right-roll by size-dx (roll needs shift>=0);
            # entries [0, w) then read kw[j + dx] with no wrap contamination
            kw = pltpu.roll(kw, w + 2 * r - dx, axis=1)
        return kw[:, :w, :]

    logits = []                          # window^2 x [th, w]
    for dy in range(window):
        for dx in range(window):
            logits.append(jnp.sum(q * shifted(dy, dx), axis=-1) * scale)

    mx = logits[0]
    for lg_p in logits[1:]:
        mx = jnp.maximum(mx, lg_p)
    es = [jnp.exp(lg_p - mx) for lg_p in logits]
    den = es[0]
    for e_p in es[1:]:
        den = den + e_p
    inv = 1.0 / den

    out = jnp.zeros_like(q)
    p = 0
    for dy in range(window):
        for dx in range(window):
            att_p = es[p] * inv          # [th, w]
            out = out + att_p[:, :, None] * shifted(dy, dx)
            p += 1

    out_ref[0] = out * m3
    for p in range(window * window):
        lg_ref[0, p] = logits[p] * m2


def _pick_tile(h: int, w: int, c: int, window: int, budget=9 * 2**20) -> int:
    """Largest divisor tile height fitting q/k/out/logits in ~9MB VMEM."""
    r = window // 2
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        bytes_needed = 4 * ((th * w * c) * 2                  # q + out
                            + (th + 2 * r) * (w + 2 * r) * c  # k scratch
                            + 2 * th * w * window * window)   # logits + exp
        if bytes_needed <= budget:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("window",))
def _fam_pallas_fwd(q, k, mask, window: int):
    b, h, w, c = q.shape
    r = window // 2
    p2 = window * window
    tile_h = _pick_tile(h, w, c, window)
    kp = jnp.pad(k, [(0, 0), (r, r), (r, r), (0, 0)])
    mask = jnp.broadcast_to(mask.astype(q.dtype), (b, h, w, 1))

    kernel = functools.partial(_fam_kernel, window=window, tile_h=tile_h)
    grid = (b, h // tile_h)
    out, lg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w, 1), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # kp: full array in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p2, tile_h, w), lambda n, t: (n, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), q.dtype),
            jax.ShapeDtypeStruct((b, p2, h, w), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * r, w + 2 * r, c), q.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(q, mask, kp)
    return out, jnp.transpose(lg, (0, 2, 3, 1))


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
    """Dispatch: Pallas kernel on TPU, XLA formulation elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return fam_attention_fused(q, k, mask, window)
    return fam_attention_xla(q, k, mask, window)
