"""Fused Pallas TPU kernel for the TAM/FAM windowed cross-frame attention.

One kernel fuses what the XLA path (tcvom_tpu.ops.fam) does in ~100 HLO
ops: per row-tile, the window^2 shifted dot products, the softmax, the
weighted neighbor sum, and the unknown-region masking — with k's halo tile
DMA'd from HBM once per tile instead of window^2 shifted reads of the
padded array. This is the hot op of the flagship model (the reference's
per-sample gather loop, models/VMN/VMN_model.py:18-68, does not lower to
TPU at all).

Forward-only: training uses jax.custom_vjp with the XLA implementation's
gradient (identical math), so autodiff works everywhere while inference
takes the fused path.
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

    # DMA this (n, tile)'s k halo tile [tile_h + 2r, w + 2r, c]; kp stays in
    # HBM (ANY requires a whole-array block, so batch/rows are sliced here)
    copy = pltpu.make_async_copy(
        kp_ref.at[n, pl.ds(ti * tile_h, th + 2 * r)], k_scratch, sem)
    copy.start()

    q = q_ref[0]                       # [th, w, c]
    m = m_ref[0]                       # [th, w, 1]
    scale = 1.0 / math.sqrt(c)
    copy.wait()

    logits = []
    for dy in range(window):
        for dx in range(window):
            ksh = k_scratch[dy:dy + th, dx:dx + w, :]
            logits.append(jnp.sum(q * ksh, axis=-1) * scale)   # [th, w]
    lg = jnp.stack(logits, axis=-1)    # [th, w, window^2]

    mx = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - mx)
    att = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jnp.zeros_like(q)
    p = 0
    for dy in range(window):
        for dx in range(window):
            ksh = k_scratch[dy:dy + th, dx:dx + w, :]
            out = out + att[:, :, p:p + 1] * ksh
            p += 1

    out_ref[0] = out * m
    lg_ref[0] = lg * m


def _pick_tile(h: int, w: int, c: int, window: int, budget=10 * 2**20) -> int:
    """Largest divisor tile height fitting q/k/out/logits in ~10MB VMEM."""
    r = window // 2
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        bytes_needed = 4 * ((th * w * c) * 2                 # q + out
                            + (th + 2 * r) * (w + 2 * r) * c  # k scratch
                            + th * w * window * window)       # logits
        if bytes_needed <= budget:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("window",))
def _fam_pallas_fwd(q, k, mask, window: int):
    b, h, w, c = q.shape
    r = window // 2
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
            pl.BlockSpec((1, tile_h, w, window * window),
                         lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), q.dtype),
            jax.ShapeDtypeStruct((b, h, w, window * window), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * r, w + 2 * r, c), q.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(q, mask, kp)
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
    """Dispatch: Pallas kernel on TPU, XLA formulation elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return fam_attention_fused(q, k, mask, window)
    return fam_attention_xla(q, k, mask, window)
