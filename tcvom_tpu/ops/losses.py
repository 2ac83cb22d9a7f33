"""Matting loss library — pure functions on ``[..., H, W, C]`` tensors.

Re-implements the reference loss semantics (utils/loss_func.py) including
its exact normalization constants, so training dynamics match:

- ``l1_mask``    — masked L1 with safe normalization      (loss_func.py:9-22)
- ``l1_grad``    — L1 on gradient magnitudes              (loss_func.py:49-56)
- ``exclusion_loss`` — 3-level F/B gradient exclusion     (loss_func.py:61-87)
- ``lap_loss``   — 5-level Laplacian pyramid L1           (loss_func.py:100-158)
- ``sparsity_loss``                                        (loss_func.py:89-93)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from tcvom_tpu.ops.image import image_gradient

EPSILON = 1.001e-5


def l1_mask(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray | None = None,
            epsilon: float = EPSILON, normalize: bool = True) -> jnp.ndarray:
    """Masked L1. With a mask and ``normalize``, divides by the clamped count
    of mask pixels above ``epsilon`` (the reference's `_safe` denominator)."""
    res = jnp.abs(x - y)
    if mask is not None:
        res = res * mask
        if normalize:
            # reference clamps the pixel count to [eps, b*c*h*w + 1]
            total = float(y.size)
            safe = jnp.clip(jnp.sum((mask > epsilon).astype(x.dtype)), epsilon, total + 1)
            return jnp.sum(res) / safe
        return jnp.sum(res)
    if normalize:
        return jnp.mean(res)
    return jnp.sum(res)


def l1_mask_hard_mining(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard-example mining L1 (reference loss_func.py:25-38, kept for API
    parity; no reference driver uses it). Per sample, keeps only masked
    pixels whose channel-summed residual exceeds that sample's masked
    median; returns (loss, new_mask).

    Shape-static reformulation of the reference's boolean-indexed sort: the
    median is a masked 50th percentile over the dense map.
    """
    res = jnp.sum(jnp.abs(x - y), axis=-1, keepdims=True)    # [B, H, W, 1]
    m = mask > 0.5
    b = x.shape[0]
    flat = res.reshape(b, -1)
    mflat = m.reshape(b, -1)
    # masked median: sort residuals with unmasked entries pushed to +inf,
    # pick the element at index floor(count * 0.5)
    big = jnp.where(mflat, flat, jnp.inf)
    srt = jnp.sort(big, axis=1)
    cnt = jnp.sum(mflat, axis=1)
    idx = jnp.clip((cnt * 0.5).astype(jnp.int32), 0, flat.shape[1] - 1)
    thresh = jnp.take_along_axis(srt, idx[:, None], axis=1)   # [B, 1]
    new_mask = (m & (flat > thresh)[..., None].reshape(res.shape)).astype(x.dtype)
    total = jnp.sum(res * new_mask) / jnp.maximum(jnp.sum(new_mask), 1.0)
    return total, new_mask


def l1_grad(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None,
            epsilon: float = EPSILON, normalize: bool = True) -> jnp.ndarray:
    """L1 between gradient magnitudes sqrt(dx^2 + dy^2 + eps)."""
    fx, fy = image_gradient(pred)
    tx, ty = image_gradient(gt)
    mag_f = jnp.sqrt(fx * fx + fy * fy + epsilon)
    mag_t = jnp.sqrt(tx * tx + ty * ty + epsilon)
    return l1_mask(mag_f, mag_t, mask=mask, normalize=normalize)


def exclusion_loss(img1: jnp.ndarray, img2: jnp.ndarray, level: int = 3,
                   epsilon: float = EPSILON, normalize: bool = True) -> jnp.ndarray:
    """Gradient exclusion loss between predicted F and B (3 pyramid levels)."""
    from tcvom_tpu.ops.image import avg_pool

    gradx_loss, grady_loss = [], []
    for _ in range(level):
        gx1, gy1 = image_gradient(img1)
        gx2, gy2 = image_gradient(img2)
        ax = 2.0 * jnp.mean(jnp.abs(gx1)) / (jnp.mean(jnp.abs(gx2)) + epsilon)
        ay = 2.0 * jnp.mean(jnp.abs(gy1)) / (jnp.mean(jnp.abs(gy2)) + epsilon)
        gx1s = jax.nn.sigmoid(gx1) * 2 - 1
        gy1s = jax.nn.sigmoid(gy1) * 2 - 1
        gx2s = jax.nn.sigmoid(gx2 * ax) * 2 - 1
        gy2s = jax.nn.sigmoid(gy2 * ay) * 2 - 1
        # per-sample mean over (H, W, C); batch dims stay
        red = tuple(range(img1.ndim - 3, img1.ndim))
        sx = jnp.mean((gx1s ** 2) * (gx2s ** 2), axis=red) + epsilon
        sy = jnp.mean((gy1s ** 2) * (gy2s ** 2), axis=red) + epsilon
        gradx_loss.append(sx ** 0.25)
        grady_loss.append(sy ** 0.25)
        img1 = avg_pool(img1, 2, 2)
        img2 = avg_pool(img2, 2, 2)
    gx = sum(gradx_loss) / float(level)
    gy = sum(grady_loss) / float(level)
    if normalize:
        return jnp.mean(gx) + jnp.mean(gy)
    return jnp.sum(gx) + jnp.sum(gy)


def sparsity_loss(pred: jnp.ndarray, trimask: jnp.ndarray, eps: float = 1e-5,
                  gamma: float = 0.9) -> jnp.ndarray:
    m = (trimask > 0.5).astype(pred.dtype)
    term = (jnp.power(pred + eps, gamma) + jnp.power(1.0 - pred + eps, gamma) - 1.0)
    return jnp.sum(term * m)


# ---------------------------------------------------------------------------
# Laplacian pyramid loss (OpenCV pyrDown/pyrUp convention)
# ---------------------------------------------------------------------------

_GAUSS_5x5 = jnp.array(
    [[1., 4., 6., 4., 1.],
     [4., 16., 24., 16., 4.],
     [6., 24., 36., 24., 6.],
     [4., 16., 24., 16., 4.],
     [1., 4., 6., 4., 1.]], dtype=jnp.float32) / 256.0


def _conv_gauss(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 5x5 conv with reflect padding on ``[B, H, W, C]``."""
    b, h, w, c = img.shape
    img = jnp.pad(img, [(0, 0), (2, 2), (2, 2), (0, 0)], mode="reflect")
    k = jnp.broadcast_to(kernel[:, :, None, None], (5, 5, 1, c)).astype(img.dtype)
    return lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _lap_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    current = img
    pyr = []
    for _ in range(levels):
        filtered = _conv_gauss(current, _GAUSS_5x5)
        down = filtered[:, ::2, ::2, :]
        # zero-interleaved upsample then 4*gauss (OpenCV pyrUp)
        b, h, w, c = down.shape
        up = jnp.zeros((b, h * 2, w * 2, c), down.dtype).at[:, ::2, ::2, :].set(down)
        up = _conv_gauss(up, 4.0 * _GAUSS_5x5)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(img: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray | None = None,
             max_levels: int = 5, normalize: bool = True) -> jnp.ndarray:
    """5-level Laplacian L1 with 2^level weights on ``[B, H, W, C]``.

    Note: the reference applies the mask only at full resolution inside
    L1_mask per level, i.e. no mask is ever passed in practice (its masked
    branch references an undefined ``epsilon``); we support the mask
    correctly but default to None like all reference call sites.
    """
    flat_img = img.reshape((-1,) + img.shape[-3:])
    flat_tgt = tgt.reshape((-1,) + tgt.shape[-3:])
    p_in = _lap_pyramid(flat_img, max_levels)
    p_tg = _lap_pyramid(flat_tgt, max_levels)
    loss = sum((2 ** lvl) * l1_mask(a, b, mask=mask, normalize=False)
               for lvl, (a, b) in enumerate(zip(p_in, p_tg)))
    if normalize:
        if mask is not None:
            safe = jnp.clip(jnp.sum((mask > 1e-6).astype(img.dtype)), EPSILON, tgt.size + 1)
        else:
            safe = float(tgt.size)
        return loss / safe
    return loss
