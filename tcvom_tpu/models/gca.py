"""GCA backbone (Guided Contextual Attention matting).

Re-design of reference models/GCA/: ResNet-D-29 encoder [3,4,4,2] with
spectral-normalized convs, 5 shortcut heads, a 3-stage guidance head on the
RGB input, and guided contextual attention at OS=8 in both encoder and
decoder (encoders/res_gca_enc.py, decoders/res_gca_dec.py, ops.py).
Input is 6 channels: normalized RGB + 3-channel one-hot trimap. NHWC.

The per-sample dynamic-kernel attention is replaced by the batched einsum
core in tcvom_tpu.ops.gca_attention (MXU-friendly); spectral-norm power
iteration state lives in the ``spectral`` collection.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import (BatchNorm, Conv, RawBatchNorm,
                                     RawConvParams, SNConv, SNConvRaw)
from tcvom_tpu.ops import subpixel as sp
from tcvom_tpu.ops.gca_attention import guided_attention_core
from tcvom_tpu.ops.image import avg_pool, reflection_pad, resize_nearest

TRIMAP_CHANNEL = 3  # reference models/GCA/__init__.py


def _zero_trimap_init(key, shape, dtype=jnp.float32):
    """Encoder conv1 init: xavier, then zero the trimap input channels
    (reference encoders/resnet_enc.py:101). shape = [kh, kw, in=6, out]."""
    w = nn.initializers.xavier_uniform()(key, shape, dtype)
    return w.at[:, :, 3:, :].set(0.0)


class GuidedCxtAtten(nn.Module):
    """Module wrapper: guidance 1x1 conv -> attention core -> W conv+BN ->
    residual (reference ops.py:83-229). ``W``'s BN scale inits to 1e-3."""
    out_channels: int = 128
    guidance_channels: int = 128

    @nn.compact
    def __call__(self, f, alpha, unknown, train: bool = False):
        f = Conv(self.guidance_channels // 2, 1, padding=0, name="guidance_conv")(f)
        h2, w2 = f.shape[-3] // 2, f.shape[-2] // 2
        fd = resize_nearest(f, (h2, w2))
        unk_d = resize_nearest(unknown, (h2, w2))
        y = guided_attention_core(fd, alpha, unk_d)
        y = Conv(self.out_channels, 1, padding=0, use_bias=False, name="W_conv")(y)
        y = BatchNorm(name="W_bn", scale_init=nn.initializers.constant(1e-3))(y, use_running_average=not train)
        return y + alpha


class EncBasicBlock(nn.Module):
    """Encoder residual block with SN convs; bn2 scale zero-init
    (reference encoders/resnet_enc.py:17-49, 96-98)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = SNConv(self.planes, 3, strides=self.stride, padding=1, name="conv1")(x, train)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = SNConv(self.planes, 3, padding=1, name="conv2")(out, train)
        out = BatchNorm(name="bn2", scale_init=nn.initializers.zeros)(out, use_running_average=not train)
        if self.stride != 1:
            identity = avg_pool(x, 2, self.stride)
            identity = SNConv(self.planes, 1, padding=0, name="ds_conv")(identity, train)
            identity = BatchNorm(name="ds_bn")(identity, use_running_average=not train)
        elif x.shape[-1] != self.planes:
            identity = SNConv(self.planes, 1, padding=0, name="ds_conv")(x, train)
            identity = BatchNorm(name="ds_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class DecBasicBlock(nn.Module):
    """Decoder residual block: SN ConvTranspose(4,2,1) when stride 2, leaky
    relu 0.2, nearest-upsample shortcut (reference decoders/resnet_dec.py)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        inplanes = x.shape[-1]
        if self.stride > 1:
            out = SNConv(inplanes, 4, strides=2, padding=1, transpose=True,
                         name="conv1")(x, train)
        else:
            out = SNConv(inplanes, 3, padding=1, name="conv1")(x, train)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.leaky_relu(out, 0.2)
        out = SNConv(self.planes, 3, padding=1, name="conv2")(out, train)
        out = BatchNorm(name="bn2", scale_init=nn.initializers.zeros)(out, use_running_average=not train)
        if self.stride != 1:
            identity = resize_nearest(x, (x.shape[-3] * 2, x.shape[-2] * 2))
            identity = SNConv(self.planes, 1, padding=0, name="up_conv")(identity, train)
            identity = BatchNorm(name="up_bn")(identity, use_running_average=not train)
        elif inplanes != self.planes:
            identity = SNConv(self.planes, 1, padding=0, name="up_conv")(x, train)
            identity = BatchNorm(name="up_bn")(identity, use_running_average=not train)
        return nn.leaky_relu(out + identity, 0.2)


class _Shortcut(nn.Module):
    """SN conv -> relu -> BN, twice (reference res_gca_enc.py:47-55).

    On TPU at eval the two convs run block-packed (the full-resolution
    shortcut heads have 32-64 channels — heavy lane waste otherwise);
    identical values, exact including borders."""
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = SNConvRaw(self.planes, x.shape[-1], name="conv1")
        b1 = RawBatchNorm(self.planes, name="bn1")
        c2 = SNConvRaw(self.planes, self.planes, name="conv2")
        b2 = RawBatchNorm(self.planes, name="bn2")
        fast = (jax.default_backend() == "tpu" and not train
                and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0)
        if not fast:
            h = b1(nn.relu(c1(x, train=train)), train=train)
            return b2(nn.relu(c2(h, train=train)), train=train)
        w1, _ = c1(kernel_only=True)
        w2, _ = c2(kernel_only=True)
        h = sp.conv2d(sp.s2d(x), sp.rep_conv_kernel(w1), padding=1)
        h = b1(nn.relu(h), train=False, phases=4)
        h = sp.conv2d(h, sp.rep_conv_kernel(w2), padding=1)
        h = b2(nn.relu(h), train=False, phases=4)
        return sp.d2s(h)


class GCAEncoder(nn.Module):
    """resnet_gca_encoder_29: layers [3, 4, 4, 2], shortcut heads, guidance
    head, GCA between layer2 and layer3 (reference res_gca_enc.py)."""
    layers: tuple = (3, 4, 4, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv1 zero-inits its trimap input channels. On TPU at eval the
        # 6/32-channel full- and half-resolution stem runs block-packed
        # (exact, incl. borders): conv1 keeps the output packed over OS=4,
        # conv2 stays packed, conv3 unpacks while striding to OS=4.
        c1 = SNConvRaw(32, x.shape[-1], strides=2, name="conv1",
                       kernel_init=_zero_trimap_init)
        b1 = RawBatchNorm(32, name="bn1")
        c2 = SNConvRaw(32, 32, name="conv2")
        b2 = RawBatchNorm(32, name="bn2")
        c3 = SNConvRaw(64, 32, strides=2, name="conv3")
        b3 = RawBatchNorm(64, name="bn3")
        # the s2d block-packing needs even spatial dims (same gate as
        # _Shortcut / GCADecoder); odd inputs take the reference-shaped path
        fast = (jax.default_backend() == "tpu" and not train
                and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0)
        if fast:
            w1, _ = c1(kernel_only=True)
            w2, _ = c2(kernel_only=True)
            w3, _ = c3(kernel_only=True)
            h = sp.conv2d(sp.s2d(x), sp.s2_packed_out_kernel3(w1),
                          stride=2, padding=1)             # OS=2 packed
            h = nn.relu(b1(h, train=False, phases=4))
            h = sp.conv2d(h, sp.rep_conv_kernel(w2), padding=1)
            x1p = nn.relu(b2(h, train=False, phases=4))
            out = sp.conv2d(x1p, sp.s2_from_packed_kernel3(w3),
                            padding=[(1, 0), (1, 0)])      # OS=4 natural
            out = nn.relu(b3(out, train=False))
            x1 = sp.d2s(x1p)                               # H/2, 32
        else:
            out = c1(x, train=train)
            out = nn.relu(b1(out, train=train))
            out = c2(out, train=train)
            x1 = nn.relu(b2(out, train=train))             # H/2, 32
            out = c3(x1, train=train)
            out = nn.relu(b3(out, train=train))            # H/4, 64

        # guidance head on RGB: 3 reflect-pad SN convs stride 2 (relu, BN)
        g = x[..., :3]
        for i, feat in enumerate((16, 32, 128)):
            g = reflection_pad(g, 1)
            g = SNConv(feat, 3, strides=2, padding=0, name=f"guidance{i}")(g, train)
            g = BatchNorm(name=f"guidance_bn{i}")(nn.relu(g), use_running_average=not train)
        im_fea = g                                                # H/8, 128

        # unknown-region map from the one-hot trimap's middle channel
        h8, w8 = x.shape[-3] // 8, x.shape[-2] // 8
        unknown = resize_nearest(x[..., 4:5], (h8, w8))

        def run_layer(h, planes, blocks, stride, name):
            h = EncBasicBlock(planes, stride, name=f"{name}_0")(h, train)
            for i in range(1, blocks):
                h = EncBasicBlock(planes, 1, name=f"{name}_{i}")(h, train)
            return h

        x2 = run_layer(out, 64, self.layers[0], 1, "layer1")      # H/4, 64
        x3 = run_layer(x2, 128, self.layers[1], 2, "layer2")      # H/8, 128
        x3 = GuidedCxtAtten(128, 128, name="gca")(im_fea, x3, unknown, train)
        x4 = run_layer(x3, 256, self.layers[2], 2, "layer3")      # H/16, 256
        out = run_layer(x4, 512, self.layers[3], 2, "layer_bottleneck")  # H/32

        fea1 = _Shortcut(32, name="shortcut0")(x, train)
        fea2 = _Shortcut(32, name="shortcut1")(x1, train)
        fea3 = _Shortcut(64, name="shortcut2")(x2, train)
        fea4 = _Shortcut(128, name="shortcut3")(x3, train)
        fea5 = _Shortcut(256, name="shortcut4")(x4, train)

        return {"bottleneck": out,
                "shortcut": (fea1, fea2, fea3, fea4, fea5),
                "image_fea": im_fea, "unknown": unknown}


class GCADecoder(nn.Module):
    """res_gca_decoder_22: layers [2, 3, 3, 2] with shortcut fusion and a
    second GCA at OS=8 (reference decoders/res_gca_dec.py). ``mode`` splits
    at OS=8 for VMN (reference models/VMN/VMN_GCA.py)."""
    layers: tuple = (2, 3, 3, 2)
    fam_channels: int = 128      # FAM width at the OS=8 split (VMN)

    @staticmethod
    def prune_enc_head(enc):
        """Keep only the enc leaves the ``mode='head'`` branch reads
        (shortcuts 1-3); fea4/fea5, the bottleneck, and the GCA guidance
        tensors feed the extract half only."""
        f1, f2, f3, _, _ = enc["shortcut"]
        return {"shortcut": (f1, f2, f3, None, None)}

    @nn.compact
    def __call__(self, enc, train: bool = False, mode: str = "full", x=None):
        fea1, fea2, fea3, fea4, fea5 = enc["shortcut"]

        def run_layer(h, planes, blocks, name):
            h = DecBasicBlock(planes, 2, name=f"{name}_0")(h, train)
            for i in range(1, blocks):
                h = DecBasicBlock(planes, 1, name=f"{name}_{i}")(h, train)
            return h

        if mode in ("full", "extract"):
            h = run_layer(enc["bottleneck"], 256, self.layers[0], "layer1") + fea5
            h = run_layer(h, 128, self.layers[1], "layer2") + fea4
            h = GuidedCxtAtten(128, 128, name="gca")(
                enc["image_fea"], h, enc["unknown"], train)
            if mode == "extract":
                return h
            x = h
        h = run_layer(x, 64, self.layers[2], "layer3") + fea3
        h = run_layer(h, 32, self.layers[3], "layer4") + fea2
        c1 = SNConvRaw(32, h.shape[-1], kernel_size=(4, 4), strides=2,
                       transpose=True, name="conv1")
        b1 = RawBatchNorm(32, name="bn1")
        w2, bias2 = RawConvParams(1, 32, name="conv2")()
        fast = (jax.default_backend() == "tpu" and not train
                and h.shape[-3] % 2 == 0 and h.shape[-2] % 2 == 0)
        if fast:
            # full-res 32-channel tail block-packed (exact): the SN
            # transposed conv becomes a 3x3 conv with packed output
            w1, _ = c1(kernel_only=True)
            hp = sp.conv2d(h, sp.convT4_packed_out_kernel(w1), padding=1)
            hp = b1(hp, train=False, phases=4)
            hp = nn.leaky_relu(hp, 0.2) + sp.s2d(fea1)
            hp = (sp.conv2d(hp, sp.rep_conv_kernel(w2), padding=1)
                  + sp.tile_bias(bias2))
            h = sp.d2s(hp)
        else:
            h = c1(h, train=train)
            h = b1(h, train=train)
            h = nn.leaky_relu(h, 0.2) + fea1
            h = sp.conv2d(h, w2, padding=1) + bias2
        return (jnp.tanh(h) + 1.0) / 2.0


class GCA(nn.Module):
    """Single-frame GCA generator (reference generators.py:35-37)."""

    def setup(self):
        self.encoder = GCAEncoder()
        self.decoder = GCADecoder()

    def __call__(self, x, extras=None, train: bool = False):
        enc = self.encoder(x, train)
        return self.decoder(enc, train)


# VMN uses the same decoder class; the extract/head split is the ``mode``
# argument (reference models/VMN/VMN_GCA.py:8-48).
GCADecoderVMN = GCADecoder
