"""VMN: temporal aggregation (TAM/FAM) over any matting backbone.

Re-design of reference models/VMN/VMN_model.py. Two deliberate departures
for TPU efficiency (math per frame is unchanged):

1. frames are folded into the batch axis — the encoder + feature-extract
   half runs once on ``[B*S, ...]`` and the decode half once on
   ``[B*(S-2), ...]`` instead of 2S sequential per-frame passes, keeping
   the MXU busy with large conv batches;
2. the FAM attention is dense and masked (see tcvom_tpu.ops.fam) instead
   of a dynamic-shape gather.

``freeze_backbone`` reproduces the reference semantics (VMN_model.py:77-81,
100-104): encoder and the extract half run in eval mode and contribute no
gradients.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import Conv
from tcvom_tpu.ops.fam_pallas import fam_attention  # pallas on TPU, XLA on CPU
from tcvom_tpu.ops.image import resize_nearest


class FeatureAggregationModule(nn.Module):
    """q/k/v 3x3 convs + two masked window attentions (VMN_model.py:9-68).

    Input ``x`` (center), ``b`` (previous), ``f`` (next): [N, H, W, C];
    ``mask``: [N, H', W', 1] unknown-region mask at any resolution (nearest
    -resized to the feature grid here). Returns (aggregated features,
    attb logits, attf logits, small_mask).
    """
    input_chn: int
    reduction: int = 1
    window: int = 7

    @nn.compact
    def __call__(self, x, b, f, mask):
        out_chn = self.input_chn // self.reduction
        key_conv = Conv(out_chn, 3, padding=1, name="key_conv")
        query_conv = Conv(out_chn, 3, padding=1, name="query_conv")
        value_conv = Conv(out_chn, 3, padding=1, name="value_conv")

        h, w = x.shape[-3], x.shape[-2]
        small_mask = resize_nearest(mask, (h, w))
        small_mask = (small_mask > 0.5).astype(x.dtype)

        q = query_conv(x)
        v = value_conv(x)
        kb = key_conv(b)
        kf = key_conv(f)
        xb, attb = fam_attention(q, kb, small_mask, self.window)
        xf, attf = fam_attention(q, kf, small_mask, self.window)
        return v + xb + xf, attb, attf, small_mask


class VMN(nn.Module):
    """Temporal wrapper: encode all frames, aggregate neighbors, decode.

    ``encoder``: module mapping [N, H, W, Cin] -> pytree of features.
    ``decoder``: module with ``mode='extract'`` (enc -> [N, h, w, C]) and
    ``mode='head'`` (enc, fam output -> prediction) call signatures.
    """
    encoder: nn.Module
    decoder: nn.Module
    fam_channels: int
    agg_window: int = 7
    agg_reduction: int = 1
    freeze_backbone: bool = False

    def setup(self):
        self.fam = FeatureAggregationModule(self.fam_channels,
                                            self.agg_reduction,
                                            self.agg_window)

    def encode_extract(self, images, extras=None, train: bool = False):
        """Per-frame half: encoder + decoder feature-extract. ``images``:
        [N, H, W, Cin]. Returns (enc pytree, OS=8 features) — the cacheable
        state of a sliding-window pipeline."""
        enc = self.encoder(images, train)
        if extras is not None:
            enc = dict(enc)
            enc["extras"] = extras
        feat = self.decoder(enc, train=train, mode="extract")
        return enc, feat

    def decode_window(self, enc_c, x_c, x_b, x_f, mask, train: bool = False):
        """Center-frame half: FAM over (prev, cur, next) cached features +
        decoder head. Returns (pred, attb, attf, small_mask)."""
        agg, attb, attf, small_mask = self.fam(x_c, x_b, x_f, mask)
        pred = self.decoder(enc_c, train=train, mode="head", x=agg)
        return pred, attb, attf, small_mask

    def __call__(self, images, masks, extras=None, train: bool = False):
        """Full-clip forward. images: [B, S, H, W, Cin]; masks: [B, S, H, W, 1] unknown region.
        ``extras``: optional pytree with leading [B, S] (e.g. FBA's raw image
        + 2ch trimap) forwarded to the decoder.

        Returns (preds [B, S, H, W, Cout] with zeroed endpoint frames,
        attb, attf: [B, S-2, h, w, window^2], small_mask [B, S-2, h, w, 1]).
        """
        b, s = images.shape[0], images.shape[1]
        backbone_train = train and not self.freeze_backbone

        flat = images.reshape((b * s,) + images.shape[2:])
        enc = self.encoder(flat, backbone_train)
        if extras is not None:
            enc = dict(enc)
            enc["extras"] = jax.tree.map(
                lambda t: t.reshape((b * s,) + t.shape[2:]), extras)
        feat = self.decoder(enc, train=backbone_train, mode="extract")

        if self.freeze_backbone:
            enc = jax.tree.map(jax.lax.stop_gradient, enc)
            feat = jax.lax.stop_gradient(feat)

        # unfold back to [B, S, ...] and slice temporal windows
        feat = feat.reshape((b, s) + feat.shape[1:])
        x_c = feat[:, 1:s - 1]
        x_b = feat[:, 0:s - 2]
        x_f = feat[:, 2:s]

        def fold(t):
            return t.reshape((b * (s - 2),) + t.shape[2:])

        agg, attb, attf, small_mask = self.fam(
            fold(x_c), fold(x_b), fold(x_f), fold(masks[:, 1:s - 1]))

        enc_mid = jax.tree.map(
            lambda t: t.reshape((b, s) + t.shape[1:])[:, 1:s - 1]
                       .reshape((b * (s - 2),) + t.shape[1:]), enc)
        pred = self.decoder(enc_mid, train=train, mode="head", x=agg)

        def unfold(t):
            return t.reshape((b, s - 2) + t.shape[1:])

        pred = unfold(pred)
        zero = jnp.zeros_like(pred[:, :1])
        preds = jnp.concatenate([zero, pred, zero], axis=1)
        return preds, unfold(attb), unfold(attf), unfold(small_mask)
