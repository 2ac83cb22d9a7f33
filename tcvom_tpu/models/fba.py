"""FBA matting backbone (F, B, Alpha estimation).

Re-design of reference models/FBA/: dilated ResNet-50 with Weight
Standardization + GroupNorm(32) (resnet_GN_WS.py, layers_WS.py, dilation
wiring in models.py:183-236), pyramid-pooling decoder (models.py:258-353)
and the closed-form FBA fusion (models.py:246-255). Input is 11 channels:
normalized RGB(3) + Gaussian-distance trimap encoding(6) + binary
bg/fg(2); output is 7 channels (alpha, F, B). NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import Conv, GroupNorm32, WSConv
from tcvom_tpu.ops.image import adaptive_avg_pool, max_pool, resize_bilinear


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck with WS convs and GN32; stride may be replaced
    by dilation (the `_nostride_dilate` surgery, models.py:207-220)."""
    planes: int
    stride: int = 1
    dilation: int = 1          # dilation of the 3x3 conv
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = WSConv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = nn.relu(GroupNorm32(name="bn1")(out))
        out = WSConv(self.planes, 3, strides=self.stride, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, name="conv2")(out)
        out = nn.relu(GroupNorm32(name="bn2")(out))
        out = WSConv(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = GroupNorm32(name="bn3")(out)
        if self.downsample:
            identity = WSConv(self.planes * 4, 1, strides=self.stride,
                              use_bias=False, name="ds_conv")(x)
            identity = GroupNorm32(name="ds_bn")(identity)
        return nn.relu(out + identity)


class FBAEncoder(nn.Module):
    """ResnetDilated(l_resnet50, dilate_scale=8) with an 11-channel stem
    (reference models.py:33-65, 183-236). Returns the conv_out pyramid."""
    input_chn: int = 11
    layers: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_out = [x]                                    # OS=1 (raw input)
        h = WSConv(64, 7, strides=2, padding=3, use_bias=False, name="conv1")(x)
        h = nn.relu(GroupNorm32(name="bn1")(h))
        conv_out.append(h)                                # OS=2
        h = max_pool(h, 3, 2, 1)                          # indices unused by decoder

        def run_layer(h, planes, blocks, stride, dilations, name):
            h = Bottleneck(planes, stride, dilations[0], downsample=True,
                           name=f"{name}_0")(h, train)
            for i in range(1, blocks):
                h = Bottleneck(planes, 1, dilations[1], name=f"{name}_{i}")(h, train)
            return h

        h = run_layer(h, 64, self.layers[0], 1, (1, 1), "layer1")
        conv_out.append(h)                                # OS=4, 256
        h = run_layer(h, 128, self.layers[1], 2, (1, 1), "layer2")
        conv_out.append(h)                                # OS=8, 512
        # layer3: stride->1, first-block 3x3 dil 1, rest dil 2
        h = run_layer(h, 256, self.layers[2], 1, (1, 2), "layer3")
        conv_out.append(h)                                # OS=8, 1024
        # layer4: stride->1, first-block 3x3 dil 2, rest dil 4
        h = run_layer(h, 512, self.layers[3], 1, (2, 4), "layer4")
        conv_out.append(h)                                # OS=8, 2048
        return {"conv_out": tuple(conv_out)}


def fba_fusion(alpha, img, F, B):
    """Closed-form consistency solve (reference models.py:246-255)."""
    F = alpha * img + (1 - alpha ** 2) * F - alpha * (1 - alpha) * B
    B = (1 - alpha) * img + (2 * alpha - alpha ** 2) * B - alpha * (1 - alpha) * F
    F = jnp.clip(F, 0, 1)
    B = jnp.clip(B, 0, 1)
    la = 0.1
    alpha = (alpha * la + jnp.sum((img - B) * (F - B), axis=-1, keepdims=True)) / (
        jnp.sum((F - B) * (F - B), axis=-1, keepdims=True) + la)
    alpha = jnp.clip(alpha, 0, 1)
    return alpha, F, B


class _PPM(nn.Module):
    """Pyramid pooling over conv5 (reference models.py:261-273)."""
    scales: tuple = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, conv5, train: bool = False):
        size = conv5.shape[-3:-1]
        outs = [conv5]
        for i, s in enumerate(self.scales):
            p = adaptive_avg_pool(conv5, s)
            p = WSConv(256, 1, use_bias=True, name=f"pool{i}_conv")(p)
            p = nn.leaky_relu(GroupNorm32(name=f"pool{i}_bn")(p), 0.01)
            outs.append(resize_bilinear(p, size, align_corners=False))
        return jnp.concatenate(outs, axis=-1)


class FBADecoder(nn.Module):
    """fba_decoder (reference models.py:258-353). ``mode`` splits at OS=8
    after conv_up1 for VMN (reference models/VMN/VMN_FBA.py)."""

    fam_channels: int = 256   # FAM width at the OS=8 split (VMN)

    @nn.compact
    def __call__(self, enc, train: bool = False, mode: str = "full", x=None):
        conv_out = enc["conv_out"]
        if "extras" in enc:
            img, two_chan_trimap = enc["extras"]
        else:
            img, two_chan_trimap = enc["img"], enc["two_chan_trimap"]

        def conv_gn_lrelu(h, feat, name):
            h = WSConv(feat, 3, padding=1, use_bias=True, name=f"{name}_conv")(h)
            return nn.leaky_relu(GroupNorm32(name=f"{name}_bn")(h), 0.01)

        if mode in ("full", "extract"):
            ppm = _PPM(name="ppm")(conv_out[-1], train)
            h = conv_gn_lrelu(ppm, 256, "up1_0")
            h = conv_gn_lrelu(h, 256, "up1_1")            # conv_up1, OS=8
            if mode == "extract":
                return h
            x = h

        h = resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=False)
        h = jnp.concatenate([h, conv_out[-4]], axis=-1)   # + OS=4 (256)
        h = conv_gn_lrelu(h, 256, "up2")
        h = resize_bilinear(h, (h.shape[-3] * 2, h.shape[-2] * 2), align_corners=False)
        h = jnp.concatenate([h, conv_out[-5]], axis=-1)   # + OS=2 (64)
        h = conv_gn_lrelu(h, 64, "up3")
        h = resize_bilinear(h, (h.shape[-3] * 2, h.shape[-2] * 2), align_corners=False)
        h = jnp.concatenate([h, conv_out[-6][..., :3], img, two_chan_trimap], axis=-1)

        h = nn.leaky_relu(Conv(32, 3, padding=1, name="up4_0")(h), 0.01)
        h = nn.leaky_relu(Conv(16, 3, padding=1, name="up4_1")(h), 0.01)
        out = Conv(7, 1, padding=0, name="up4_2")(h)

        alpha = jnp.clip(out[..., 0:1], 0, 1)
        F = jax.nn.sigmoid(out[..., 1:4])
        B = jax.nn.sigmoid(out[..., 4:7])
        alpha, F, B = fba_fusion(alpha, img, F, B)
        return jnp.concatenate([alpha, F, B], axis=-1)


class FBA(nn.Module):
    """Single-frame FBA MattingModule (reference models.py:7-30).

    ``extras`` = (raw scaled image [B,H,W,3], 2ch trimap [B,H,W,2]).
    """

    def setup(self):
        self.encoder = FBAEncoder()
        self.decoder = FBADecoder()

    def __call__(self, x, extras=None, train: bool = False):
        img, two_chan_trimap = extras
        enc = self.encoder(x, train)
        enc = dict(enc)
        enc["img"] = img
        enc["two_chan_trimap"] = two_chan_trimap
        return self.decoder(enc, train)


# VMN uses the same decoder class; per-frame (img, two_chan_trimap) arrive
# through enc['extras'] (reference models/VMN/VMN_FBA.py:6-59).
FBADecoderVMN = FBADecoder
