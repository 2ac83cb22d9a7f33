"""TAM/FAM windowed cross-frame attention — dense, masked, shape-static.

The reference implements this (models/VMN/VMN_model.py:18-68) as a Python
loop over batch elements with a dynamic-shape gather of unknown-trimap
pixels (`torch.nonzero`), unfold over a window^2 neighborhood, scaled dot,
softmax, weighted sum, and a scatter back to dense maps. Dynamic shapes and
per-sample loops do not lower to TPU, so here the computation is dense:

  logits[b, y, x, p] = <q[b,y,x,:], k[b, y+dy(p), x+dx(p), :]> / sqrt(C)
  att = softmax_p(logits)
  out[b, y, x, :] = sum_p att[p] * k[b, y+dy, x+dx, :]

with zero padding outside the frame (matching F.unfold's zero pad — padded
positions contribute logit exactly 0) and the unknown-region mask applied
multiplicatively to both the output features and the returned raw logits
(the reference scatters zeros outside the mask: VMN_model.py:47-56).

Cost is O(H*W*window^2*C) elementwise FMAs — bandwidth-bound, so the XLA
formulation below streams shifted views of k instead of materializing the
[H, W, window^2, C] patch tensor. A fused Pallas kernel for the inference
path lives in :mod:`tcvom_tpu.ops.fam_pallas`.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shifts(window: int):
    r = window // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            yield dy, dx


def fam_attention(q: jnp.ndarray, k: jnp.ndarray, mask: jnp.ndarray,
                  window: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense masked window attention.

    q, k: ``[B, H, W, C]``; mask: ``[B, H, W, 1]`` in {0, 1} at feature
    resolution. Returns ``(attended [B, H, W, C], logits [B, H, W, window^2])``
    both zeroed outside the mask. Patch index p is row-major over (dy, dx),
    matching F.unfold order so the attention-supervision labels line up.
    """
    b, h, w, c = q.shape
    r = window // 2
    scale = 1.0 / math.sqrt(c)
    mask = mask.astype(q.dtype)

    kp = jnp.pad(k, [(0, 0), (r, r), (r, r), (0, 0)])

    logits = []
    for dy, dx in _shifts(window):
        ksh = jax.lax.dynamic_slice(kp, (0, r + dy, r + dx, 0), (b, h, w, c))
        logits.append(jnp.sum(q * ksh, axis=-1) * scale)
    logits = jnp.stack(logits, axis=-1)                    # [B, H, W, P]

    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.zeros_like(q)
    for p, (dy, dx) in enumerate(_shifts(window)):
        ksh = jax.lax.dynamic_slice(kp, (0, r + dy, r + dx, 0), (b, h, w, c))
        out = out + att[..., p:p + 1] * ksh

    return out * mask, logits * mask
