"""On-device video matting metrics (SAD / MSE / SSDA / dtSSD / MESSDdt).

TPU-native equivalents of the reference's numpy/CPU metric functions
(calc_metric.py:22-46 and the flow-warped temporal error in
utils/utils.py:90-123). All functions take ``[H, W]`` (or ``[H, W, 2]`` for
flow) arrays and are jit/vmap friendly; batch them with ``jax.vmap`` and the
whole validation sweep never leaves the device.

Masks are float/bool {0,1}; invalid flow is encoded as NaN exactly like the
reference's quantized flow PNGs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tcvom_tpu.ops.image import coords_grid, grid_sample


def sad(a: jnp.ndarray, g: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute difference over the mask (reference SAD/mSAD)."""
    mf = m.astype(a.dtype)
    n = jnp.maximum(jnp.sum(mf), 1.0)
    return jnp.sum(jnp.abs(a - g) * mf) / n


def mse(a: jnp.ndarray, g: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    mf = m.astype(a.dtype)
    n = jnp.maximum(jnp.sum(mf), 1.0)
    return jnp.sum(((a - g) ** 2) * mf) / n


def ssda(a: jnp.ndarray, g: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    mf = m.astype(a.dtype)
    return jnp.sqrt(jnp.sum(((a - g) ** 2) * mf))


def dtssd(a: jnp.ndarray, g: jnp.ndarray, m: jnp.ndarray,
          ha: jnp.ndarray, hg: jnp.ndarray) -> jnp.ndarray:
    """sqrt of masked SSD between temporal differences (calc_metric.py:31-34)."""
    mf = m.astype(a.dtype)
    d = (a - ha) - (g - hg)
    return jnp.sqrt(jnp.sum(d * d * mf))


def messddt(a: jnp.ndarray, g: jnp.ndarray, m: jnp.ndarray,
            ha: jnp.ndarray, hg: jnp.ndarray, flow: jnp.ndarray
            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flow-compensated temporal error (utils/utils.py:90-123, metric=True).

    ``flow``: ``[H, W, 2]`` (dx, dy) from the current to the adjacent frame,
    NaN where invalid. Returns (fix_sum, org_sum, valid_count): L1 and
    squared-difference variants summed over valid pixels, plus the count.
    """
    h, w = a.shape
    nanmask = jnp.isnan(flow)
    flow0 = jnp.where(nanmask, 0.0, flow)
    coords = coords_grid(h, w, a.dtype) + flow0                 # [H, W, 2]
    valid = (~jnp.any(nanmask, axis=-1)) & (m > 0.5 if m.dtype != jnp.bool_ else m)
    vf = valid.astype(a.dtype)

    pgt = grid_sample(hg[..., None], coords)[..., 0]
    pa = grid_sample(ha[..., None], coords)[..., 0]
    cur = a - g
    warped = pa - pgt
    err = jnp.abs(cur - warped) * vf
    err2 = jnp.abs(cur * cur - warped * warped) * vf
    return jnp.sum(err), jnp.sum(err2), jnp.sum(valid.astype(jnp.int32))


@jax.jit
def frame_metrics(a, g, tri, ha, hg, hvalid, flow):
    """All per-frame metrics in one jitted call.

    a, g:   pred / gt alpha in [0,1], float32 [H, W]
    tri:    trimap image in [0,255] (mask = 0<tri<255), [H, W]
    ha, hg: next-frame pred / gt (ignored when hvalid == 0)
    flow:   [H, W, 2] flow to next frame, NaN-invalid
    Returns a dict of scalars matching calc_metric.py:128.
    """
    mask = (tri > 0) & (tri < 255)
    mf = mask
    out = {
        "mSAD": sad(a, g, mf),
        "MSE": mse(a, g, mf),
        "SSDA": ssda(a, g, mf),
        "pixel_count": jnp.sum(mask.astype(jnp.int32)),
    }
    fix, org, valid = messddt(a, g, mf, ha, hg, flow)
    hv = hvalid.astype(a.dtype)
    out["dtSSD"] = dtssd(a, g, mf, ha, hg) * hv
    out["MESSDdt_fix"] = fix * hv
    out["MESSDdt"] = org * hv
    out["flow_pixel_count"] = (valid * hvalid).astype(jnp.int32)
    return out
