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


def _fam_kernel(q_ref, m_ref, kp_ref, out_ref, *rest, window: int,
                tile_h: int, tile_w: int, w_halo: int, interpret: bool,
                need_logits: bool = True):
    if need_logits:
        lg_ref, k_scratch, k_roll, sem = rest
    else:
        k_scratch, k_roll, sem = rest
        lg_ref = None
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
            if need_logits:
                lg_ref[0, 0, 0, dy * window + dx] = (
                    l_p * m2).astype(lg_ref.dtype)
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

    out_ref[0] = ((s_run / d_run[:, :, None])
                  * m2[:, :, None]).astype(out_ref.dtype)


def _fam_kernel_mxu(q_ref, m_ref, kp_ref, out_ref, *rest, window: int,
                    tile_h: int, tile_w: int, w_halo: int,
                    need_logits: bool = True):
    """MXU formulation: local window attention as banded batched matmuls.

    Per dy, the correlation of the q tile against the full W halo is one
    batched matmul ``[th: wt x c] @ [c x w_halo]``; the window diagonals
    are extracted with iota band masks (Mosaic cannot reshape across tiled
    dims). The reconstruction scatters attention weights back into a banded
    matrix with the same masks and runs a second batched matmul. This moves
    the O(window^2 * c) inner products from the VPU to the MXU; with f32
    inputs the dots run in 3-pass mode for XLA-parity numerics, bf16 takes
    the fast single pass.
    """
    if need_logits:
        lg_ref, k_scratch, lg_scratch, sem = rest
    else:
        k_scratch, lg_scratch, sem = rest
        lg_ref = None
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

    # MXU dots in f32 need the 3-pass (bf16x3) mode to match the XLA path;
    # bf16 inputs take the fast single-pass
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # band masks: band_dx[j, i] == 1 iff i == j + dx (diagonal offset dx)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wt, w_halo), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (wt, w_halo), 1)
    diag = ii - jj

    # Phase A: correlations (one batched matmul per dy) + band extraction
    def corr_body(dy, _):
        kdy = k_scratch[pl.ds(dy, th)]   # [th, w_halo, c]
        corr = jax.lax.dot_general(      # [th, wt, w_halo]
            q, kdy, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)

        def dx_body(dx, _):
            band = (diag == dx).astype(corr.dtype)
            lg_scratch[pl.ds(dy * window + dx, 1)] = (
                jnp.sum(corr * band[None], axis=-1) * scale)[None]
            return 0

        return jax.lax.fori_loop(0, window, dx_body, 0)

    jax.lax.fori_loop(0, window, corr_body, 0)

    # Phase B: exact softmax over the window^2 logits (small: [P, th, wt])
    lg_all = lg_scratch[:]
    mx = jnp.max(lg_all, axis=0)
    es_all = jnp.exp(lg_all - mx[None])
    inv = 1.0 / jnp.sum(es_all, axis=0)

    # Phase C: banded reconstruction matmuls
    def out_body(dy, out):
        def band_body(dx, banded):
            # dynamic REF read (value dynamic_slice doesn't lower on TPU)
            l_p = lg_scratch[pl.ds(dy * window + dx, 1)][0]
            att_p = jnp.exp(l_p - mx) * inv              # [th, wt]
            band = (diag == dx).astype(jnp.float32)
            return banded + att_p[:, :, None] * band[None]

        banded = jax.lax.fori_loop(
            0, window, band_body, jnp.zeros((th, wt, w_halo), jnp.float32))
        kdy = k_scratch[pl.ds(dy, th)]
        return out + jax.lax.dot_general(                # [th, wt, c]
            banded.astype(q.dtype), kdy, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec).astype(q.dtype)

    out = jax.lax.fori_loop(0, window, out_body, jnp.zeros_like(q))

    out_ref[0] = (out * m2[:, :, None]).astype(out_ref.dtype)
    if need_logits:
        for p in range(window * window):
            lg_ref[0, 0, 0, p] = (lg_scratch[p] * m2).astype(lg_ref.dtype)


def _fam_kernel_mxu2(q_ref, m_ref, kp_ref, out_ref, k_scratch, kall, sem, *,
                     window: int, tile_h: int, tile_w: int, w_halo: int):
    """Inference-only (no logits) MXU formulation: ONE correlation matmul
    and ONE reconstruction matmul per tile.

    The per-dy row slices of the k halo are copied side by side into a
    single [th, window*w_halo, c] block, so the window^2 correlation is a
    single batched ``[th: wt x c] @ [c x window*w_halo]`` product. A
    position t = pos - j in the combined axis is a valid (dy, dx) shift
    iff ``t mod w_halo < window`` (pos = dy*w_halo + j + dx), so ONE band
    mask drives the softmax — and the masked ``exp`` matrix IS the banded
    reconstruction operand: ``out = softmax_banded @ kall`` sums over all
    dy in the contraction. This removes the window^2 band-extract /
    band-scatter VPU loops and the per-dy matmul dispatch of
    :func:`_fam_kernel_mxu` (measured 3.8 -> ~1 ms per streaming step at
    136x240xC256 bf16). Training keeps the logits-writing kernels.
    """
    r = window // 2
    n = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    th, wt, c = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    wide = window * w_halo

    copy = pltpu.make_async_copy(
        kp_ref.at[n, pl.ds(ti * tile_h, th + 2 * r),
                  pl.ds(tj * tile_w, w_halo)], k_scratch, sem)
    copy.start()

    q = q_ref[0]                        # [th, wt, c]
    m2 = m_ref[0, 0, 0]                 # [th, wt]
    scale = 1.0 / math.sqrt(c)
    copy.wait()

    # side-by-side dy slices: kall[:, dy*w_halo:(dy+1)*w_halo, :]
    for dy in range(window):
        kall[:, pl.ds(dy * w_halo, w_halo), :] = k_scratch[pl.ds(dy, th)]

    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    corr = jax.lax.dot_general(         # [th, wt, window*w_halo]
        q, kall[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec) * scale

    # valid iff t = pos - j satisfies t mod w_halo < window (and t >= 0,
    # implied: pos >= j always reaches t >= 0 within the band)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wt, wide), 0)
    pp = jax.lax.broadcasted_iota(jnp.int32, (wt, wide), 1)
    t = pp - jj
    valid = (t >= 0) & (t % w_halo < window)

    corr = jnp.where(valid[None], corr, -1e30)
    mx = jnp.max(corr, axis=-1, keepdims=True)
    es = jnp.exp(corr - mx)
    es = jnp.where(valid[None], es, 0.0)
    inv = 1.0 / jnp.sum(es, axis=-1, keepdims=True)

    out = jax.lax.dot_general(          # [th, wt, c]
        (es * inv).astype(q.dtype), kall[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)

    out_ref[0] = (out * m2[:, :, None].astype(jnp.float32)).astype(out_ref.dtype)


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


def _choose_impl(h: int, w: int, c: int, dtype) -> str:
    """'vpu' | 'mxu' | 'xla' — measured policy (tools/bench_fam.py on
    TPU v5e, artifact bench_fam.json; delta-timed with a forced host
    readback — enqueue-only timing lies through the device tunnel):

    grid       C    f32  xla/vpu/mxu (ms)    bf16  xla/vpu/mxu (ms)
    64x64    256    0.37 / 0.27 / 0.50       0.64 /  n/a / 0.29
    136x240  256    2.95 / 3.93 / 2.80       2.06 /  n/a / 1.95
    136x240  128    1.60 / 3.17 / 2.25       1.14 /  n/a / 1.86

    The VPU kernel wins small f32 grids (training crops); the MXU banded
    kernel wins bf16 everywhere it lowers and wide-channel (C>=256) f32
    1080p grids; XLA keeps C=128 at 1080p. The VPU variant does not lower
    in bf16 (its sublane-8 roll tiles are below bf16's 16-sublane minimum).

    Narrow channels (C < 128, i.e. Index's FAM width 32 — reference
    models/VMN/VMN_Index.py:10) are zero-padded to the 128-lane minimum by
    the ``fam_attention`` wrapper below on the bf16 large-grid no-logits
    path, where the padded mxu2 kernel measured faster than XLA at the
    true width (bench_fam.json c32_pad rows); everything else keeps XLA.
    """
    if c % 128 or _pick_tiles(h, w) is None:
        return "xla"
    small = h * w <= 64 * 64
    if small:
        return "vpu" if dtype == jnp.float32 else "mxu"
    if c >= 256:
        return "mxu"
    return "xla"


def _pad_channels(q, k, c_pad: int):
    """Zero-pad q/k channels to ``c_pad`` lanes without changing the math:
    zero lanes add nothing to the q·k dots, and the kernel's 1/sqrt(c_pad)
    scale is compensated by pre-scaling q with sqrt(c_pad/c). The padded
    output's extra channels are zeros (a weighted sum of zero-padded k), so
    the caller slices back to c."""
    c = q.shape[-1]
    q = q * jnp.asarray(math.sqrt(c_pad / c), q.dtype)
    pad = [(0, 0)] * (q.ndim - 1) + [(0, c_pad - c)]
    return jnp.pad(q, pad), jnp.pad(k, pad)


@functools.partial(jax.jit, static_argnames=("window", "interpret", "mxu",
                                             "need_logits", "mxu2"))
def _fam_pallas_fwd(q, k, mask, window: int, interpret: bool = False,
                    mxu: bool = True, need_logits: bool = True,
                    mxu2: bool = False):
    assert not (mxu2 and need_logits), "mxu2 is the no-logits kernel"
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
    mask2 = jnp.broadcast_to(mask.astype(jnp.float32)[..., 0], (b, h, w))
    mask2 = mask2.reshape(b, hb, tile_h, wb, tile_w).transpose(0, 1, 3, 2, 4)
    if mxu2:
        kernel = functools.partial(_fam_kernel_mxu2, window=window,
                                   tile_h=tile_h, tile_w=tile_w,
                                   w_halo=w_halo)
        scratch2 = pltpu.VMEM((tile_h, window * w_halo, c), q.dtype)  # kall
    elif mxu:
        kernel = functools.partial(_fam_kernel_mxu, window=window,
                                   tile_h=tile_h, tile_w=tile_w,
                                   w_halo=w_halo, need_logits=need_logits)
        scratch2 = pltpu.VMEM((p2, tile_h, tile_w), jnp.float32)  # logits
    else:
        kernel = functools.partial(_fam_kernel, window=window, tile_h=tile_h,
                                   tile_w=tile_w, w_halo=w_halo,
                                   interpret=interpret,
                                   need_logits=need_logits)
        scratch2 = pltpu.VMEM((tile_h + 2 * r, w_halo, c), q.dtype)  # roll
    grid = (b, hb, wb)
    out_specs = [
        pl.BlockSpec((1, tile_h, tile_w, c), lambda n, t, s: (n, t, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, w, c), q.dtype)]
    if need_logits:
        out_specs.append(
            pl.BlockSpec((1, 1, 1, p2, tile_h, tile_w),
                         lambda n, t, s: (n, t, s, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hb, wb, p2, tile_h, tile_w), q.dtype))
    outs = pl.pallas_call(
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * r, w_halo, c), q.dtype),
            scratch2,
            pltpu.SemaphoreType.DMA,
        ],
    )(q, mask2, kp)
    if not need_logits:
        return outs[0], None
    out, lg = outs
    # [B, Hb, Wb, P, th, wt] -> [B, H, W, P]
    lg = jnp.transpose(lg, (0, 1, 4, 2, 5, 3)).reshape(b, h, w, p2)
    return out, lg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fam_attention_fused(q, k, mask, window: int, mxu: bool = True):
    """Same contract as ops.fam.fam_attention, fused on TPU. Differentiable
    (backward runs the XLA formulation's VJP)."""
    return _fam_pallas_fwd(q, k, mask, window, mxu=mxu)


def _fwd(q, k, mask, window, mxu):
    out = _fam_pallas_fwd(q, k, mask, window, mxu=mxu)
    return out, (q, k, mask)


def _bwd(window, mxu, residuals, cts):
    q, k, mask = residuals
    _, vjp = jax.vjp(lambda q_, k_: fam_attention_xla(q_, k_, mask, window),
                     q, k)
    dq, dk = vjp(cts)
    return dq, dk, None


fam_attention_fused.defvjp(_fwd, _bwd)


def fam_attention(q, k, mask, window: int, use_pallas: bool | None = None,
                  need_logits: bool = True):
    """Dispatch: fused Pallas kernel on TPU wherever it measures faster
    than the XLA formulation (see _choose_impl for the measured table),
    XLA otherwise. Covers both the 512^2 training crop (VPU variant,
    3.5x XLA) and the 1088x1920 inference frame (MXU-banded variant).

    ``need_logits=False`` (inference-only, not differentiable through the
    fused path) skips the raw-logits output entirely — the kernel writes
    no [B, H, W, window^2] tensor and the post-kernel tile transpose
    disappears; the returned logits are zeros for XLA to DCE. Only the
    L_att training loss consumes them (reference models/model.py:286-321);
    the pred drivers discard attb/attf.

    Narrow channels (Index's FAM width 32) take the fused path at 1080p
    bf16 inference by zero-padding to 128 lanes (``_pad_channels``; the
    dots, softmax and logits are unchanged — measured on chip: padded
    mxu2 matches XLA to bf16 rounding and runs 1.5x faster at 136x240,
    bench_fam.json c32_pad rows; XLA keeps f32 and small grids, see the
    dispatch comment). Training keeps XLA for C<128: the custom_vjp's
    backward runs the XLA formulation anyway, so the fused forward would
    only add a pad/slice pair around identical math."""
    h, w, c = q.shape[-3], q.shape[-2], q.shape[-1]
    c_pad = c if c % 128 == 0 else 128 * -(-c // 128)
    # narrow channels: only the no-logits inference path pads (see above)
    c_eff = c_pad if (c != c_pad and not need_logits) else c
    if use_pallas is None:
        impl = (_choose_impl(h, w, c_eff, q.dtype)
                if jax.default_backend() == "tpu" else "xla")
        # padded mxu2 beats XLA at the 1080p bf16 narrow-channel grid
        # (measured 0.175 vs 0.262 ms at 136x240 c32->128, bench_fam.json
        # c32_pad rows): the pad makes c_eff==128 which _choose_impl maps
        # to 'xla' at large grids, but the single-matmul-pair kernel has
        # no per-dy band loops. XLA keeps f32 (vpu-no-logits measured
        # 1.86 vs 0.61 ms) and small grids (0.219 vs 0.085 ms at 64x64).
        if (impl == "xla" and c != c_eff and not need_logits
                and _pick_tiles(h, w) is not None
                and q.dtype == jnp.bfloat16 and h * w > 64 * 64):
            impl = "mxu"
    elif use_pallas:
        # forced-Pallas still picks vpu/mxu by the measured policy — the
        # VPU variant does not lower in bf16, so hardcoding it here would
        # be a footgun (it also loses at large grids)
        impl = _choose_impl(h, w, c_eff, q.dtype)
        if impl == "xla":    # shape doesn't tile; honor the request anyway
            impl = "mxu" if q.dtype == jnp.bfloat16 else "vpu"
            if _pick_tiles(h, w) is None or c_eff % 128:
                raise ValueError(
                    f"use_pallas=True but grid {h}x{w}xC{c} does not tile "
                    "for the fused kernels (need H%8==0, W%8==0, C%128==0)")
    else:
        impl = "xla"
    if impl != "xla":
        if not need_logits:
            qk = (q, k) if c == c_eff else _pad_channels(q, k, c_eff)
            # the single-matmul-pair kernel; f32 at large grids would blow
            # VMEM (kall + two f32 [th, wt, window*w_halo] temporaries)
            use2 = impl == "mxu" and (q.dtype == jnp.bfloat16
                                      or h * w <= 64 * 64)
            out, _ = _fam_pallas_fwd(qk[0], qk[1], mask, window,
                                     mxu=(impl == "mxu"),
                                     mxu2=use2, need_logits=False)
            if c != c_eff:
                out = out[..., :c]
            lg = jnp.zeros(q.shape[:-1] + (window * window,), q.dtype)
            return out, lg
        return fam_attention_fused(q, k, mask, window, mxu=(impl == "mxu"))
    return fam_attention_xla(q, k, mask, window)
