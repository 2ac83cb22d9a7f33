"""DIM backbone (Deep Image Matting, VGG16 encoder-decoder).

Re-design of reference models/DIM/vggnet.py:10-133 and the VMN split
variant models/VMN/VMN_DIM.py: 4-channel input (norm RGB + 1ch trimap),
VGG16 conv/BN stacks with five argmax max-pools, conv6 7x7->4096, and a
mirrored decoder using max-unpool with the recorded indices. NHWC.

The VMN decoder splits at OS=8 (after dconv4, 256 channels) — the FAM
attention is applied between ``extract`` and ``head``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import BatchNorm, Conv, RawConvParams
from tcvom_tpu.ops import subpixel as sp
from tcvom_tpu.ops.image import max_pool_argmax_2x2, max_unpool_2x2


class _ConvBNRelu(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, 3, padding=1, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class DIMEncoder(nn.Module):
    """VGG16-style encoder; returns (pool indices 1..5, conv6 features)."""
    input_chn: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        idxs = []
        for stage, (n_convs, feat) in enumerate(
                [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)], start=1):
            for j in range(1, n_convs + 1):
                x = _ConvBNRelu(feat, name=f"block{stage}{j}")(x, train)
            x, idx = max_pool_argmax_2x2(x)
            idxs.append(idx)
        x6 = nn.relu(Conv(4096, 7, padding=3, name="conv6")(x))
        return {"indices": tuple(idxs), "x6": x6}


class DIMDecoder(nn.Module):
    """Full decoder for the single-frame DeepMatting model."""

    @nn.compact
    def __call__(self, enc, train: bool = False):
        idx1, idx2, idx3, idx4, idx5 = enc["indices"]
        x = nn.relu(Conv(512, 1, padding=0, name="dconv6")(enc["x6"]))
        x = nn.relu(Conv(512, 5, padding=2, name="dconv5")(max_unpool_2x2(x, idx5)))
        x = nn.relu(Conv(256, 5, padding=2, name="dconv4")(max_unpool_2x2(x, idx4)))
        x = nn.relu(Conv(128, 5, padding=2, name="dconv3")(max_unpool_2x2(x, idx3)))
        x = nn.relu(Conv(64, 5, padding=2, name="dconv2")(max_unpool_2x2(x, idx2)))
        x = nn.relu(Conv(64, 5, padding=2, name="dconv1")(max_unpool_2x2(x, idx1)))
        return jnp.clip(Conv(1, 5, padding=2, name="alpha_pred")(x), 0.0, 1.0)


class DeepMatting(nn.Module):
    """Single-frame DIM: 4ch input -> alpha (reference DIM_VGG())."""
    input_chn: int = 4

    def setup(self):
        self.encoder = DIMEncoder(self.input_chn)
        self.decoder = DIMDecoder()

    def __call__(self, x, extras=None, train: bool = False):
        return self.decoder(self.encoder(x, train), train)


def _dim_head_slow(x, idx3, idx2, idx1, p):
    """Reference-shaped head: unpool -> 5x5 conv per level
    (models/VMN/VMN_DIM.py:121-137)."""
    h = nn.relu(sp.conv2d(max_unpool_2x2(x, idx3), p["w3"], padding=2) + p["b3"])
    h = nn.relu(sp.conv2d(max_unpool_2x2(h, idx2), p["w2"], padding=2) + p["b2"])
    h = nn.relu(sp.conv2d(max_unpool_2x2(h, idx1), p["w1"], padding=2) + p["b1"])
    return jnp.clip(sp.conv2d(h, p["wa"], padding=2) + p["ba"], 0.0, 1.0)


def _dim_head_fast(x, idx3, idx2, idx1, p):
    """The same arithmetic block-packed (ops/subpixel.py): max-unpool is a
    phase scatter (no interleave ever materializes) and each 5x5 conv runs
    as a packed 3x3 conv with 4x the channels on the half grid. Exact
    everywhere — unpool has no cross-pixel taps and packed-conv zero
    padding commutes — so no border stitching is needed."""
    h = sp.unpool_to_phases(x, idx3)                        # OS/8 grid, 4*256
    h = nn.relu(sp.conv2d(h, sp.rep_conv5_kernel(p["w3"]), padding=1)
                + sp.tile_bias(p["b3"]))
    h = sp.d2s(h)                                           # OS/4, 128
    h = sp.unpool_to_phases(h, idx2)
    h = nn.relu(sp.conv2d(h, sp.rep_conv5_kernel(p["w2"]), padding=1)
                + sp.tile_bias(p["b2"]))
    h = sp.d2s(h)                                           # OS/2, 64
    h = sp.unpool_to_phases(h, idx1)
    h = nn.relu(sp.conv2d(h, sp.rep_conv5_kernel(p["w1"]), padding=1)
                + sp.tile_bias(p["b1"]))
    h = (sp.conv2d(h, sp.rep_conv5_kernel(p["wa"]), padding=1)
         + sp.tile_bias(p["ba"]))
    return jnp.clip(sp.d2s(h), 0.0, 1.0)                    # OS/1, 1


class DIMDecoderVMN(nn.Module):
    """DIM decoder split at OS=8 for VMN (reference models/VMN/VMN_DIM.py:75).

    ``extract``: dconv6 -> unpool5/dconv5 -> unpool4/dconv4 -> [B, H/8, W/8, 256]
    ``head``: FAM output -> unpool3..1 convs -> alpha. On TPU the head runs
    in the subpixel block-packed layout (identical values, wide-channel
    convs, no unpool interleaves).
    """
    fam_channels: int = 256

    @staticmethod
    def prune_enc_head(enc):
        """Keep only the enc leaves the ``mode='head'`` branch reads
        (pool indices 1-3); idx4/idx5/x6 feed the extract half only."""
        i1, i2, i3, _, _ = enc["indices"]
        return {"indices": (i1, i2, i3, None, None)}

    @nn.compact
    def __call__(self, enc, train: bool = False, mode: str = "extract", x=None):
        if mode == "extract":
            _, _, _, idx4, idx5 = enc["indices"]
            h = nn.relu(Conv(512, 1, padding=0, name="dconv6")(enc["x6"]))
            h = nn.relu(Conv(512, 5, padding=2, name="dconv5")(max_unpool_2x2(h, idx5)))
            h = nn.relu(Conv(256, 5, padding=2, name="dconv4")(max_unpool_2x2(h, idx4)))
            return h
        idx1, idx2, idx3, _, _ = enc["indices"]
        w3, b3 = RawConvParams(128, 256, (5, 5), name="dconv3")()
        w2, b2 = RawConvParams(64, 128, (5, 5), name="dconv2")()
        w1, b1 = RawConvParams(64, 64, (5, 5), name="dconv1")()
        wa, ba = RawConvParams(1, 64, (5, 5), name="alpha_pred")()
        p = dict(w3=w3, b3=b3, w2=w2, b2=b2, w1=w1, b1=b1, wa=wa, ba=ba)
        head = (_dim_head_fast if jax.default_backend() == "tpu"
                else _dim_head_slow)
        return head(x, idx3, idx2, idx1, p)
