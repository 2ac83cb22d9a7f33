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

    The projections are exposed separately (:meth:`qkv` / :meth:`key`) so a
    sliding-window pipeline can compute them once per frame and cache them —
    in the plain form every frame's key projection is recomputed twice (once
    as each neighbor). :meth:`aggregate` runs both window attentions in one
    batched call (one Pallas launch over 2N instead of two over N).
    """
    input_chn: int
    reduction: int = 1
    window: int = 7

    def setup(self):
        out_chn = self.input_chn // self.reduction
        self.key_conv = Conv(out_chn, 3, padding=1)
        self.query_conv = Conv(out_chn, 3, padding=1)
        self.value_conv = Conv(out_chn, 3, padding=1)

    def qkv(self, x):
        """Per-frame projections — the cacheable state of a stream."""
        return self.query_conv(x), self.key_conv(x), self.value_conv(x)

    def key(self, x):
        return self.key_conv(x)

    def aggregate(self, q, v, kb, kf, mask, need_logits: bool = True):
        """Both neighbor attentions from precomputed projections.
        ``need_logits=False`` (inference) lets the fused kernel skip the
        raw attb/attf logits output — only L_att training reads them."""
        h, w = q.shape[-3], q.shape[-2]
        small_mask = resize_nearest(mask, (h, w))
        small_mask = (small_mask > 0.5).astype(q.dtype)
        n = q.shape[0]
        # one batched attention over [prev; next] — same per-sample math,
        # half the kernel launches
        x2, att2 = fam_attention(
            jnp.concatenate([q, q], axis=0),
            jnp.concatenate([kb, kf], axis=0),
            jnp.concatenate([small_mask, small_mask], axis=0), self.window,
            need_logits=need_logits)
        return (v + x2[:n] + x2[n:], att2[:n], att2[n:], small_mask)

    def __call__(self, x, b, f, mask):
        q = self.query_conv(x)
        v = self.value_conv(x)
        kb = self.key_conv(b)
        kf = self.key_conv(f)
        return self.aggregate(q, v, kb, kf, mask)


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

    def encode_extract_qkv(self, images, extras=None, train: bool = False):
        """:meth:`encode_extract` plus the frame's FAM projections, so the
        stream caches (q, k, v) instead of raw features and the decode half
        runs no convolutions before the attention (the key projection would
        otherwise be recomputed for every window the frame neighbors)."""
        enc, feat = self.encode_extract(images, extras, train)
        q, k, v = self.fam.qkv(feat)
        return enc, {"q": q, "k": k, "v": v}

    def decode_window(self, enc_c, x_c, x_b, x_f, mask, train: bool = False):
        """Center-frame half: FAM over (prev, cur, next) cached features +
        decoder head. Returns (pred, attb, attf, small_mask)."""
        agg, attb, attf, small_mask = self.fam(x_c, x_b, x_f, mask)
        pred = self.decoder(enc_c, train=train, mode="head", x=agg)
        return pred, attb, attf, small_mask

    def decode_window_qkv(self, enc_c, qkv_c, k_b, k_f, mask,
                          train: bool = False, need_logits: bool = True,
                          packed_alpha: bool = False):
        """:meth:`decode_window` from cached projections (see
        :meth:`encode_extract_qkv`). ``packed_alpha`` (FBA streaming matte
        path only) makes the decoder return the fused alpha in s4d 16-pack
        layout instead of the full-res prediction."""
        agg, attb, attf, small_mask = self.fam.aggregate(
            qkv_c["q"], qkv_c["v"], k_b, k_f, mask,
            need_logits=need_logits)
        kw = {"packed_alpha": True} if packed_alpha else {}
        pred = self.decoder(enc_c, train=train, mode="head", x=agg, **kw)
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
