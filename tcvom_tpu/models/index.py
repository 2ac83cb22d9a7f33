"""IndexNet matting backbone (MobileNetV2 + learned index pooling).

Re-design of reference models/Index/net.py (encoder :85-249, decoder
:252-294), hlindex.py (DepthwiseM2OIndexBlock), hlaspp.py and hlconv.py.
All encoder conv strides are 1; downsampling happens through learned index
maps: ``x <- idx_en * x`` followed by ``4 * avg_pool2d(x, 2, 2)``, and the
decoder upsamples with ``idx_de * nearest_resize``. NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import BatchNorm, Conv, RawConvParams
from tcvom_tpu.ops import subpixel as sp
from tcvom_tpu.ops.image import avg_pool, pixel_shuffle, resize_nearest


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class ConvBN(nn.Module):
    """conv + BN + ReLU6 (reference hlconv.py:36-41)."""
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel, strides=self.stride,
                 padding=self.kernel // 2, use_bias=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return relu6(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual, stride fixed to 1, optional dilation
    (reference net.py:25-83). Depthwise conv uses the reference's explicit
    symmetric fixed_padding."""
    inp: int
    oup: int
    dilation: int = 1
    expand_ratio: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = round(self.inp * self.expand_ratio)
        use_res = self.inp == self.oup
        d = self.dilation
        h = x
        if self.expand_ratio != 1:
            h = Conv(hidden, 1, padding=0, use_bias=False, name="pw")(h)
            h = BatchNorm(name="pw_bn")(h, use_running_average=not train)
            h = relu6(h)
        # fixed padding: total = 2*d, split d/d (net.py:63-69)
        h = jnp.pad(h, [(0, 0), (d, d), (d, d), (0, 0)])
        h = Conv(hidden, 3, padding=0, dilation=d, groups=hidden,
                 use_bias=False, name="dw")(h)
        h = BatchNorm(name="dw_bn")(h, use_running_average=not train)
        h = relu6(h)
        h = Conv(self.oup, 1, padding=0, use_bias=False, name="pw_linear")(h)
        h = BatchNorm(name="pw_linear_bn")(h, use_running_average=not train)
        return x + h if use_res else h


class DepthwiseM2OIndexBlock(nn.Module):
    """4 parallel k4/s2 conv heads -> sigmoid / softmax-over-4 ->
    pixel_shuffle (reference hlindex.py:120-167, nonlinear + context)."""
    inp: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for i in range(1, 5):
            h = Conv(self.inp, 4, strides=2, padding=1, use_bias=False,
                     name=f"indexnet{i}_conv0")(x)
            h = BatchNorm(name=f"indexnet{i}_bn")(h, use_running_average=not train)
            h = relu6(h)
            h = Conv(self.inp, 1, padding=0, use_bias=False,
                     name=f"indexnet{i}_conv1")(h)
            feats.append(h)
        stacked = jnp.stack(feats, axis=-1)        # [B, h, w, C, 4]
        y = jax.nn.sigmoid(stacked)
        z = jax.nn.softmax(y, axis=-1)
        b, hh, ww, c, _ = y.shape
        # channel layout c*4 + k, then pixel shuffle r=2
        idx_en = pixel_shuffle(z.reshape(b, hh, ww, c * 4), 2)
        idx_de = pixel_shuffle(y.reshape(b, hh, ww, c * 4), 2)
        return idx_en, idx_de


class ASPP(nn.Module):
    """ASPP at OS=32: dilations (1, 2, 4, 8) + global pool branch
    (reference hlaspp.py:87-135)."""
    oup: int = 160

    @nn.compact
    def __call__(self, x, train: bool = False):
        def branch_1x1(h, name):
            h = Conv(256, 1, padding=0, use_bias=False, name=f"{name}_conv")(h)
            h = BatchNorm(name=f"{name}_bn")(h, use_running_average=not train)
            return relu6(h)

        def branch_sep(h, dil, name):
            c = h.shape[-1]
            h = Conv(c, 3, padding=dil, dilation=dil, groups=c, use_bias=False,
                     name=f"{name}_dw")(h)
            h = BatchNorm(name=f"{name}_dw_bn")(h, use_running_average=not train)
            h = relu6(h)
            h = Conv(256, 1, padding=0, use_bias=False, name=f"{name}_pw")(h)
            h = BatchNorm(name=f"{name}_pw_bn")(h, use_running_average=not train)
            return relu6(h)

        x1 = branch_1x1(x, "aspp1")
        x2 = branch_sep(x, 2, "aspp2")
        x3 = branch_sep(x, 4, "aspp3")
        x4 = branch_sep(x, 8, "aspp4")
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = branch_1x1(g, "global")
        g = jnp.broadcast_to(g, x4.shape[:-1] + (g.shape[-1],))
        h = jnp.concatenate([x1, x2, x3, x4, g], axis=-1)
        h = Conv(self.oup, 1, padding=0, use_bias=False, name="bottleneck_conv")(h)
        h = BatchNorm(name="bottleneck_bn")(h, use_running_average=not train)
        h = relu6(h)
        return nn.Dropout(0.5)(h, deterministic=not train)


_LAYER_CFG = [
    # (expand_ratio, out, n_blocks)
    (1, 16, 1),    # layer1
    (6, 24, 2),    # layer2
    (6, 32, 3),    # layer3
    (6, 64, 4),    # layer4
    (6, 96, 3),    # layer5
    (6, 160, 3),   # layer6
    (6, 320, 1),   # layer7
]


class IndexMattingEncoder(nn.Module):
    """Returns the 13-feature bundle of reference net.py:196-233 as a dict."""
    input_chn: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        def run_layer(h, li):
            t, out, n = _LAYER_CFG[li - 1]
            inp = h.shape[-1]
            for i in range(n):
                h = InvertedResidual(inp if i == 0 else out, out, 1, t,
                                     name=f"layer{li}_{i}")(h, train)
            return h

        def index_pool(h, name):
            # NOTE: the reference re-binds the skip feature to idx_en * h
            # before pooling (net.py:199-224) — the decoder consumes the
            # index-weighted maps, so we return the multiplied tensor.
            idx_en, idx_de = DepthwiseM2OIndexBlock(h.shape[-1], name=name)(h, train)
            h = idx_en * h
            return 4.0 * avg_pool(h, 2, 2), h, idx_de

        l0 = ConvBN(32, 3, 1, name="layer0")(x, train)
        l0p, l0, idx0_de = index_pool(l0, "index0")
        l1 = run_layer(l0p, 1)
        l2 = run_layer(l1, 2)
        l2p, l2, idx2_de = index_pool(l2, "index2")
        l3 = run_layer(l2p, 3)
        l3p, l3, idx3_de = index_pool(l3, "index3")
        l4 = run_layer(l3p, 4)
        l4p, l4, idx4_de = index_pool(l4, "index4")
        l5 = run_layer(l4p, 5)
        l6 = run_layer(l5, 6)
        l6p, l6, idx6_de = index_pool(l6, "index6")
        l7 = run_layer(l6p, 7)
        l = ASPP(160, name="dconv_pp")(l7, train)
        return {"l": l, "l6": l6, "idx6_de": idx6_de, "l5": l5, "l4": l4,
                "idx4_de": idx4_de, "l3": l3, "idx3_de": idx3_de, "l2": l2,
                "idx2_de": idx2_de, "l1": l1, "l0": l0, "idx0_de": idx0_de}


class IndexedUpsampling(nn.Module):
    """idx_de-modulated nearest upsample + concat skip + conv_bn
    (reference hldecoder.py:115-133)."""
    oup: int
    kernel: int = 5

    @nn.compact
    def __call__(self, l_encode, l_low, indices=None, train: bool = False):
        if indices is not None:
            l_encode = indices * resize_nearest(l_encode, l_low.shape[-3:-1])
        h = jnp.concatenate([l_encode, l_low], axis=-1)
        return ConvBN(self.oup, self.kernel, 1, name="dconv")(h, train)


class _Pred(nn.Module):
    """Final prediction head: conv_bn(32->1, k5) + 1->1 k5 conv
    (reference net.py:16-22)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(1, 5, 1, name="p0")(x, train)
        return Conv(1, 5, padding=2, use_bias=False, name="p1")(x)


class IndexMattingDecoder(nn.Module):
    @nn.compact
    def __call__(self, enc, train: bool = False):
        l = IndexedUpsampling(96, name="decoder_layer6")(enc["l"], enc["l6"], enc["idx6_de"], train)
        l = IndexedUpsampling(64, name="decoder_layer5")(l, enc["l5"], None, train)
        l = IndexedUpsampling(32, name="decoder_layer4")(l, enc["l4"], enc["idx4_de"], train)
        l = IndexedUpsampling(24, name="decoder_layer3")(l, enc["l3"], enc["idx3_de"], train)
        l = IndexedUpsampling(16, name="decoder_layer2")(l, enc["l2"], enc["idx2_de"], train)
        l = IndexedUpsampling(32, name="decoder_layer1")(l, enc["l1"], None, train)
        l = IndexedUpsampling(32, name="decoder_layer0")(l, enc["l0"], enc["idx0_de"], train)
        return _Pred(name="pred")(l, train)


class IndexMatting(nn.Module):
    """Single-frame IndexNet: 4ch input -> alpha (reference net.py:285-294)."""
    input_chn: int = 4

    def setup(self):
        self.encoder = IndexMattingEncoder(self.input_chn)
        self.decoder = IndexMattingDecoder()

    def __call__(self, x, extras=None, train: bool = False):
        return self.decoder(self.encoder(x, train), train)


class _RawConvBN(nn.Module):
    """ConvBN with raw-parameter access and an optional block-packed eval
    path (param/batch_stats layout identical to ConvBN: <name>/conv/kernel,
    <name>/bn/{scale,bias} + batch_stats mean/var, flax BatchNorm
    momentum-0.9 update semantics).

    - ``__call__(x, train)``: reference-shaped conv + BN + relu6.
    - ``__call__(packed=(x_packed, skip_packed), train=False)``: the same
      5x5 conv with both operands block-packed over the half grid, as two
      packed-3x3 convs summed; BN applies the running-stat affine tiled
      over phases. Eval only (the fast path serves inference).
    """
    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x=None, train: bool = False, packed=None):
        if packed is not None:
            cin = sum(t.shape[-1] for t in packed if t is not None) // 4
        else:
            cin = x.shape[-1]
        w, _ = RawConvParams(self.features, cin, (self.kernel, self.kernel),
                             use_bias=False, name="conv")()
        bn = _RawBN(self.features, name="bn")
        if packed is None:
            y = sp.conv2d(x, w, padding=self.kernel // 2)
            return relu6(bn(y, train=train))
        xp, skp = packed
        c1 = xp.shape[-1] // 4
        y = sp.conv2d(xp, sp.rep_conv5_kernel(w[:, :, :c1]), padding=1)
        if skp is not None:
            y = y + sp.conv2d(skp, sp.rep_conv5_kernel(w[:, :, c1:]),
                              padding=1)
        return relu6(bn(y, train=False, phases=4))


# _RawBN moved to layers.RawBatchNorm (shared with the GCA packed paths)
from tcvom_tpu.models.layers import RawBatchNorm as _RawBN


class _RawIndexedUp(nn.Module):
    """IndexedUpsampling over a _RawConvBN('dconv') — same param paths as
    IndexedUpsampling; adds the block-packed eval path: the idx-modulated
    nearest 2x upsample is a phase broadcast times the packed index map
    (no interleave materializes) and the 5x5 conv runs packed. Exact —
    nearest upsample copies and packed-conv zero padding commutes."""
    oup: int
    kernel: int = 5

    @nn.compact
    def __call__(self, l_encode, l_low, indices=None, train: bool = False,
                 packed: bool = False):
        layer = _RawConvBN(self.oup, self.kernel, name="dconv")
        if packed:
            if indices is not None:
                xp = jnp.tile(l_encode, (1, 1, 1, 4)) * sp.s2d(indices)
            else:
                xp = sp.s2d(l_encode)
            return sp.d2s(layer(packed=(xp, sp.s2d(l_low))))
        if indices is not None:
            l_encode = indices * resize_nearest(l_encode, l_low.shape[-3:-1])
        return layer(jnp.concatenate([l_encode, l_low], axis=-1), train=train)


class _RawPred(nn.Module):
    """_Pred over raw params (same paths: pred/p0/{conv,bn}, pred/p1)."""

    @nn.compact
    def __call__(self, x, train: bool = False, packed: bool = False):
        p0 = _RawConvBN(1, 5, name="p0")
        w1, _ = RawConvParams(1, 1, (5, 5), use_bias=False, name="p1")()
        if packed:
            h = p0(packed=(sp.s2d(x), None))
            h = sp.conv2d(h, sp.rep_conv5_kernel(w1), padding=1)
            return sp.d2s(h)
        h = p0(x, train=train)
        return sp.conv2d(h, w1, padding=2)


class IndexMattingDecoderVMN(nn.Module):
    """Split at OS=8 (after decoder_layer4, 32 ch) — reference VMN_Index.py.

    The head runs block-packed on TPU at eval (identical values; the
    16-32 channel full-res convs otherwise waste the 128-lane axis)."""
    fam_channels: int = 32

    @staticmethod
    def prune_enc_head(enc):
        """Keep only the enc leaves the ``mode='head'`` branch reads
        (skip levels 0-3 and their decoder index maps)."""
        return {k: enc[k] for k in
                ("l0", "l1", "l2", "l3", "idx0_de", "idx2_de", "idx3_de")}

    @nn.compact
    def __call__(self, enc, train: bool = False, mode: str = "extract", x=None):
        if mode == "extract":
            l = IndexedUpsampling(96, name="decoder_layer6")(enc["l"], enc["l6"], enc["idx6_de"], train)
            l = IndexedUpsampling(64, name="decoder_layer5")(l, enc["l5"], None, train)
            l = IndexedUpsampling(32, name="decoder_layer4")(l, enc["l4"], enc["idx4_de"], train)
            return l
        packed = jax.default_backend() == "tpu" and not train
        l = _RawIndexedUp(24, name="decoder_layer3")(x, enc["l3"], enc["idx3_de"], train, packed)
        l = _RawIndexedUp(16, name="decoder_layer2")(l, enc["l2"], enc["idx2_de"], train, packed)
        l = _RawIndexedUp(32, name="decoder_layer1")(l, enc["l1"], None, train, packed)
        l = _RawIndexedUp(32, name="decoder_layer0")(l, enc["l0"], enc["idx0_de"], train, packed)
        return _RawPred(name="pred")(l, train, packed)
