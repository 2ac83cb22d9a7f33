"""FBA matting backbone (F, B, Alpha estimation).

Re-design of reference models/FBA/: dilated ResNet-50 with Weight
Standardization + GroupNorm(32) (resnet_GN_WS.py, layers_WS.py, dilation
wiring in models.py:183-236), pyramid-pooling decoder (models.py:258-353)
and the closed-form FBA fusion (models.py:246-255). Input is 11 channels:
normalized RGB(3) + Gaussian-distance trimap encoding(6) + binary
bg/fg(2); output is 7 channels (alpha, F, B). NHWC.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcvom_tpu.models.layers import (Conv, GroupNorm32, RawConvParams,
                                     RawNormParams, WSConv, ws_standardize)
from tcvom_tpu.ops import subpixel as sp
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
        w1, _ = RawConvParams(64, self.input_chn, (7, 7), use_bias=False,
                              kernel_init=nn.initializers.he_normal(),
                              name="conv1")()
        if (x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
                and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0):
            # stem on the block-packed input: 44 channels on the half grid
            # instead of 11 at full res (s2d is an identity conv here)
            # NB: s2d's W-fold conv path, NOT prefer_reshape — the
            # reshape-transpose on the full-res 11-channel input measured
            # 18.3 vs 24.1 fps end-to-end (r05 A/B)
            h = sp.conv2d(sp.s2d(x), sp.stem7_s2_packed_kernel(
                ws_standardize(w1)), padding=[(2, 1), (2, 1)])
        else:
            h = sp.conv2d(x, ws_standardize(w1), stride=2, padding=3)
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


# Bisect support (tools/bisect_fba_bf16.py): when True the decoder keeps
# the packed tail but unpacks BEFORE the fusion solve (the pre-08743e1
# graph: d4s then full-resolution solve) instead of solving in the 16-pack
# layout. Trace-time Python flag; production never sets it.
BISECT_SOLVE_FULLRES = False


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
        """Returns the branch list (conv5 + 4 upsampled pool branches)
        UNCONCATENATED — the consumer folds the concat into its conv as a
        sum of per-part convs (the [H/8, W/8, 3072] concat measured a
        ~200 MB materialization + a same-sized relayout copy at 1080p)."""
        size = conv5.shape[-3:-1]
        outs = [conv5]
        for i, s in enumerate(self.scales):
            p = adaptive_avg_pool(conv5, s)
            p = WSConv(256, 1, use_bias=True, name=f"pool{i}_conv")(p)
            p = nn.leaky_relu(GroupNorm32(name=f"pool{i}_bn")(p), 0.01)
            outs.append(resize_bilinear(p, size, align_corners=False))
        return outs


def _fba_tail_slow(h4, skip2, ex1, p, gn_stats=None):
    """Reference-shaped decoder tail from the post-up2 OS=4 features to the
    raw 7-channel output (conv_up3 + conv_up4, models.py:316-342).
    ``gn_stats``: optional (mul, add) per-channel affine from the
    full-image GroupNorm — required when computing border strips so the
    strip normalizes with global statistics."""
    h = resize_bilinear(h4, (h4.shape[-3] * 2, h4.shape[-2] * 2))
    h = jnp.concatenate([h, skip2], axis=-1)              # + OS=2 (64)
    h = sp.conv2d(h, ws_standardize(p["w3"]), padding=1) + p["b3"]
    if gn_stats is None:
        n, hh, ww, c = h.shape
        xg = h.astype(jnp.float32).reshape(n, hh, ww, 32, c // 32)
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.mean((xg - mu) ** 2, axis=(1, 2, 4), keepdims=True)
        y = ((xg - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(n, hh, ww, c)
        h = (y * p["gn_scale"] + p["gn_bias"]).astype(h.dtype)
    else:
        h = sp.apply_norm_stats(h, *gn_stats)
    h = nn.leaky_relu(h, 0.01)
    h = resize_bilinear(h, (h.shape[-3] * 2, h.shape[-2] * 2))
    h = jnp.concatenate([h, ex1], axis=-1)
    h = nn.leaky_relu(sp.conv2d(h, p["w40"], padding=1) + p["b40"], 0.01)
    h = nn.leaky_relu(sp.conv2d(h, p["w41"], padding=1) + p["b41"], 0.01)
    return sp.conv2d(h, p["w42"], padding=0) + p["b42"]


def _stage_b_slow(h4, skip2, w3, b3):
    """Reference-shaped conv_up3 pre-GN output (used for border strips)."""
    h = resize_bilinear(h4, (h4.shape[-3] * 2, h4.shape[-2] * 2))
    h = jnp.concatenate([h, skip2], axis=-1)
    return sp.conv2d(h, w3, padding=1) + b3


def _patch_b_border(b, h4, skip2, w3, b3):
    """Exact stage-b (conv_up3 pre-GN) values on the 1-pixel packed border
    ring: the subpixel composite's ring approximates the conv's zero
    padding, and it must be patched BEFORE the GroupNorm statistics (a
    wrong ring would contaminate the global mean/var and shift every
    pixel). Top+bottom and left+right strips run as two batch-2 slow-path
    chains instead of four batch-1 ones (thin-strip ops are launch-bound)."""
    n = h4.shape[0]
    tb = sp.s2d(_stage_b_slow(
        jnp.concatenate([h4[:, :4], h4[:, -4:]], axis=0),
        jnp.concatenate([skip2[:, :8], skip2[:, -8:]], axis=0), w3, b3))
    b = b.at[:, :1].set(tb[:n, :1])
    b = b.at[:, -1:].set(tb[n:, -1:])
    lr = sp.s2d(_stage_b_slow(
        jnp.concatenate([h4[:, :, :4], h4[:, :, -4:]], axis=0),
        jnp.concatenate([skip2[:, :, :8], skip2[:, :, -8:]], axis=0), w3, b3))
    b = b.at[:, :, :1].set(lr[:n, :, :1])
    b = b.at[:, :, -1:].set(lr[n:, :, -1:])
    return b


def _fba_tail_fast16(h4, skip2, ex_parts, p):
    """16-pack (4x4 block) re-layout of the OS=1 stages: after conv_up3
    the whole tail lives on the quarter grid with 128-512 channels — every
    conv is a plain stride-1 NHWC conv (the 2x2-packed form's lhs-dilated
    composites made XLA materialize 130-140 MB zero-stuffed inputs per
    conv at 1080p), and the raw-input/image/trimap concat is packed
    part-wise (``s4d_parts``) instead of materializing the 8-channel
    full-res tensor (measured 6.1 ms of 16x-lane-padded writes).
    Interior-exact; border ring stitched by the caller as usual."""
    w3 = ws_standardize(p["w3"])
    cin = h4.shape[-1]
    b = (sp.up_conv(h4, w3[:, :, :cin])
         + sp.conv2d(skip2, sp.stride2_conv_kernel(w3[:, :, cin:]),
                     stride=2, padding=1)
         + sp.tile_bias(p["b3"]))

    b = _patch_b_border(b, h4, skip2, w3, p["b3"])
    gn_stats = sp.group_norm_s2d_stats(b, p["gn_scale"], p["gn_bias"])
    mul4 = jnp.tile(gn_stats[0], (1, 4))[:, None, None, :]
    add4 = jnp.tile(gn_stats[1], (1, 4))[:, None, None, :]
    b = nn.leaky_relu((b.astype(jnp.float32) * mul4 + add4).astype(b.dtype),
                      0.01)                               # rep2[h2]

    nex = sum(t.shape[-1] for t in ex_parts)
    nup = p["w40"].shape[2] - nex                         # 64 upsampled chans
    ex16, row_perm = sp.s4d_parts(ex_parts)
    k_ex = jnp.take(sp.rep16_conv_kernel(p["w40"][:, :, nup:]),
                    jnp.asarray(row_perm), axis=2)
    c = (sp.conv2d(b, sp.up_conv_16_kernel(p["w40"][:, :, :nup]), padding=1)
         + sp.conv2d(ex16, k_ex, padding=1)
         + sp.tile_bias16(p["b40"]))
    c = nn.leaky_relu(c, 0.01)                            # rep1[h1], 16-pack
    d = nn.leaky_relu(sp.conv2d(c, sp.rep16_conv_kernel(p["w41"]), padding=1)
                      + sp.tile_bias16(p["b41"]), 0.01)
    e = (sp.conv2d(d, sp.rep16_1x1_kernel(p["w42"]), padding=0)
         + sp.tile_bias16(p["b42"]))
    return e, gn_stats


def _fba_tail_fast4(h4, skip2, ex_parts, p):
    """4-pack (2x2 block) re-layout of the OS=1 stages on the HALF grid.

    The 16-pack tail (``_fba_tail_fast16``) pays phase-redundant MXU
    FLOPs: its [3,3,16I,16O] kernels are ~6% dense (each output phase
    reads only 9 of the 144 tap-phase slots), so up4 burns ~770 GFLOP of
    mostly-zeros per 1080p frame — measured 5.7 ms of 190 TFLOP/s conv
    time (PROFILE_r05). The 2x2 form's [3,3,4I,4O] kernels are 25% dense:
    up4 drops to ~194 GFLOP with 128/64-lane convs, and none of the
    original 2x2-era lhs-dilated composites return (that pathology, the
    130-140 MB zero-stuffed inputs, came from composing the upsample as
    input dilation; here the OS=2 stage unpacks with a reshape-transpose
    ``d2s`` and the upsample∘conv runs as ``up_conv`` — edge-pad + plain
    conv). Interior-exact; border ring stitched by the caller as usual."""
    w3 = ws_standardize(p["w3"])
    cin = h4.shape[-1]
    b = (sp.up_conv(h4, w3[:, :, :cin])
         + sp.conv2d(skip2, sp.stride2_conv_kernel(w3[:, :, cin:]),
                     stride=2, padding=1)
         + sp.tile_bias(p["b3"]))

    b = _patch_b_border(b, h4, skip2, w3, p["b3"])
    gn_stats = sp.group_norm_s2d_stats(b, p["gn_scale"], p["gn_bias"])
    mul4 = jnp.tile(gn_stats[0], (1, 4))[:, None, None, :]
    add4 = jnp.tile(gn_stats[1], (1, 4))[:, None, None, :]
    b = nn.leaky_relu((b.astype(jnp.float32) * mul4 + add4).astype(b.dtype),
                      0.01)                               # rep2[h2]
    h2 = sp.d2s(b, prefer_reshape=True)                   # OS=2 natural

    nex = sum(t.shape[-1] for t in ex_parts)
    nup = p["w40"].shape[2] - nex                         # 64 upsampled chans
    ex4, row_perm = sp.s2d_parts(ex_parts)
    k_ex = jnp.take(sp.rep_conv_kernel(p["w40"][:, :, nup:]),
                    jnp.asarray(row_perm), axis=2)
    c = (sp.up_conv(h2, p["w40"][:, :, :nup])
         + sp.conv2d(ex4, k_ex, padding=1)
         + sp.tile_bias(p["b40"]))
    c = nn.leaky_relu(c, 0.01)                            # rep1[h1], 4-pack
    d = nn.leaky_relu(sp.conv2d(c, sp.rep_conv_kernel(p["w41"]), padding=1)
                      + sp.tile_bias(p["b41"]), 0.01)
    e = (sp.conv2d(d, sp.rep_1x1_kernel(p["w42"]), padding=0)
         + sp.tile_bias(p["b42"]))
    return e, gn_stats                                    # [N, H/2, W/2, 28]


def _tail_fast_ok(h4, ex_parts, ring: int = 8, force_fast=None) -> bool:
    """Whether the 16-pack tail path applies (TPU backend, grid large
    enough for the border-strip extents, full-res dims 4-aligned)."""
    s4 = (ring + 1) // 4 + 4                              # strip extent, OS=4
    fast_ok = (jax.default_backend() == "tpu" if force_fast is None
               else force_fast)
    return bool(fast_ok and h4.shape[-3] >= 2 * s4
                and h4.shape[-2] >= 2 * s4
                and ex_parts[0].shape[-3] % 4 == 0
                and ex_parts[0].shape[-2] % 4 == 0)


# Tail pack factor: 16 = 4x4 blocks on the quarter grid
# (_fba_tail_fast16), 4 = 2x2 blocks on the half grid (_fba_tail_fast4).
# Both were measured end-to-end on v5e at 1080p bf16: 16-pack 23.6 fps,
# 4-pack 22.6 fps — the 4-pack's honest-FLOP kernels (194 vs ~770 GFLOP
# in up4) run at only ~90 TF/s on their 64/128-lane shapes and its extra
# relayouts (d2s of the OS=2 stage, s2d of the thin ex parts, edge pads)
# cost ~2.5 ms, so the fat-but-saturated 16-pack wins. Module-level so
# the A/B harness can flip it; exactness parity pinned by
# tests/test_subpixel.py::test_fba_tail_pack4_matches_pack16.
TAIL_PACK = 16


def _fba_tail_packed(h4, skip2, ex_parts, p, ring: int = 8,
                     pack_n: int | None = None):
    """Packed tail with the border ring stitched IN PACKED SPACE: the
    slow-path strips (full-res, ``ring`` px) are block-packed (a pure
    permutation) and written over the packed border rows/cols — the same
    full-res pixels an unpack-then-stitch would write, so unpacking this
    equals the stitch-after-unpack exactly. Keeping the tail output packed
    lets the consumer run the (pointwise) fusion solve on the packed grid
    and unpack only the channels it actually needs — when only alpha
    survives (streaming inference) the F/B unpacks are dead code to XLA.
    ``ring`` must be a multiple of the pack's row granularity."""
    pack_n = TAIL_PACK if pack_n is None else pack_n
    if pack_n == 4:
        assert ring % 2 == 0, ring
        e, gn_stats = _fba_tail_fast4(h4, skip2, ex_parts, p)
        rq, pack = ring // 2, sp.s2d
    else:
        assert ring % 4 == 0, ring
        e, gn_stats = _fba_tail_fast16(h4, skip2, ex_parts, p)
        rq = ring // 4
        pack = functools.partial(sp.s4d, prefer_reshape=True)
    s4 = (ring + 1) // 4 + 4
    s2, s1, r = 2 * s4, 4 * s4, ring
    n = h4.shape[0]
    # opposite-edge strips share a shape — run each pair as one batch-2
    # slow-path chain (the thin-strip ops are launch-bound, so halving the
    # op-chain count nearly halves the stitch cost); GN affine reuses the
    # full-image stats, tiled across the doubled batch
    gn2 = tuple(jnp.concatenate([g, g], axis=0) for g in gn_stats)

    def strips(axis):
        # strip extents scale 1:2:4 across the OS=4/2/1 operands
        def cat_sl(t, ext):
            s = [slice(None)] * 3
            s[axis] = slice(None, ext)
            lead = t[tuple(s)]
            s[axis] = slice(-ext, None)
            return jnp.concatenate([lead, t[tuple(s)]], axis=0)
        h4s = cat_sl(h4, s4)
        skips = cat_sl(skip2, s2)
        ex1s = jnp.concatenate([cat_sl(t, s1) for t in ex_parts], axis=-1)
        return _fba_tail_slow(h4s, skips, ex1s, p, gn_stats=gn2)

    tb = strips(axis=1)
    e = e.at[:, :rq].set(pack(tb[:n, :r]))
    e = e.at[:, -rq:].set(pack(tb[n:, -r:]))
    lr = strips(axis=2)
    e = e.at[:, :, :rq].set(pack(lr[:n, :, :r]))
    e = e.at[:, :, -rq:].set(pack(lr[n:, :, -r:]))
    return e


def _fba_tail(h4, skip2, ex_parts, p, ring: int = 8, force_fast=None):
    """Fast tail + exact border ring stitched from the reference-shaped
    path (upsample edge-clamp and conv zero-pad do not commute with the
    subpixel composition on a <=7px OS=1 ring; ``ring``=8 is margin).
    GroupNorm strips reuse the full-image statistics. ``ex_parts`` is the
    tuple (raw rgb, image, 2ch trimap) — concatenated lazily so the fast
    path never materializes the thin full-res concat."""
    if not _tail_fast_ok(h4, ex_parts, ring, force_fast):
        ex1 = jnp.concatenate(ex_parts, axis=-1)
        return _fba_tail_slow(h4, skip2, ex1, p)
    e = _fba_tail_packed(h4, skip2, ex_parts, p, ring)
    if e.shape[-1] == 4 * 7:
        return sp.d2s(e, prefer_reshape=True)
    return sp.d4s(e, prefer_reshape=True)


class FBADecoder(nn.Module):
    """fba_decoder (reference models.py:258-353). ``mode`` splits at OS=8
    after conv_up1 for VMN (reference models/VMN/VMN_FBA.py).

    The conv_up3/conv_up4 tail runs in the subpixel re-layout on TPU
    (:mod:`tcvom_tpu.ops.subpixel`): OS=2 stages 4-packed, OS=1 stages
    16-packed on the quarter grid — identical parameters, identical math;
    other backends take the reference-shaped path. The PPM and skip
    concats are folded into their convs as per-part kernel slices.
    """

    fam_channels: int = 256   # FAM width at the OS=8 split (VMN)

    @staticmethod
    def prune_enc_head(enc):
        """Drop the enc leaves the ``mode='head'`` branch never reads
        (the OS=8 conv_out[3..5] pyramid, ~115 MB/frame at 1080p, and the
        8 unused raw-input channels), keeping container shapes so the
        negative indexing below is unchanged. Streaming caches / jit
        boundaries carry only what decode actually consumes."""
        co = enc["conv_out"]
        out = {"conv_out": (co[0][..., :3], co[1], co[2], None, None, None)}
        for k in ("extras", "img", "two_chan_trimap"):
            if k in enc:
                out[k] = enc[k]
        return out

    @nn.compact
    def __call__(self, enc, train: bool = False, mode: str = "full", x=None,
                 packed_alpha: bool = False):
        """``packed_alpha=True`` (streaming matte path) returns ONLY the
        fused alpha, in the s4d 16-pack layout [N, H/4, W/4, 16] — the
        full-res [..., 1] unpack (127/128 dead lanes) never materializes;
        the caller quantizes packed and unpacks in uint8 via
        ops.subpixel.d4s_flat. Trace-time flag; pure permutation of the
        default path's alpha channel."""
        conv_out = enc["conv_out"]
        if "extras" in enc:
            img, two_chan_trimap = enc["extras"]
        else:
            img, two_chan_trimap = enc["img"], enc["two_chan_trimap"]

        he = nn.initializers.he_normal()

        def conv_gn_lrelu(h, feat, name):
            h = WSConv(feat, 3, padding=1, use_bias=True, name=f"{name}_conv")(h)
            return nn.leaky_relu(GroupNorm32(name=f"{name}_bn")(h), 0.01)

        def split_conv_gn_lrelu(parts, feat, name):
            # conv(concat(parts)) == sum of per-part convs with the kernel
            # sliced along its input axis — the concat never materializes.
            # Weight standardization runs on the FULL kernel first (the
            # reference normalizes over all 3x3xCin taps). Same params,
            # same init draws (path and shape unchanged vs WSConv).
            cin = sum(t.shape[-1] for t in parts)
            w, bb = RawConvParams(feat, cin, kernel_init=he,
                                  name=f"{name}_conv")()
            wss = ws_standardize(w)
            y, off = None, 0
            for t in parts:
                c = t.shape[-1]
                yi = sp.conv2d(t, wss[:, :, off:off + c].astype(t.dtype),
                               padding=1)
                y = yi if y is None else y + yi
                off += c
            y = y + bb.astype(y.dtype)
            return nn.leaky_relu(GroupNorm32(name=f"{name}_bn")(y), 0.01)

        if mode in ("full", "extract"):
            ppm_parts = _PPM(name="ppm")(conv_out[-1], train)
            h = split_conv_gn_lrelu(ppm_parts, 256, "up1_0")
            h = conv_gn_lrelu(h, 256, "up1_1")            # conv_up1, OS=8
            if mode == "extract":
                return h
            x = h

        h = resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=False)
        h4 = split_conv_gn_lrelu([h, conv_out[-4]], 256, "up2")  # + OS=4 (256)
        w3, b3 = RawConvParams(64, 256 + conv_out[-5].shape[-1],
                               kernel_init=he, name="up3_conv")()
        gn_scale, gn_bias = RawNormParams(64, name="up3_bn")()
        # raw rgb + image + 2ch trimap stay separate tensors — the fast
        # tail packs them part-wise (s4d_parts); only the slow path and
        # the border strips concatenate (thin slices)
        ex_parts = (conv_out[-6][..., :3], img, two_chan_trimap)
        nex = sum(t.shape[-1] for t in ex_parts)
        w40, b40 = RawConvParams(32, 64 + nex, name="up4_0")()
        w41, b41 = RawConvParams(16, 32, name="up4_1")()
        w42, b42 = RawConvParams(7, 16, kernel_size=(1, 1), name="up4_2")()
        p = dict(w3=w3, b3=b3, gn_scale=gn_scale, gn_bias=gn_bias,
                 w40=w40, b40=b40, w41=w41, b41=b41, w42=w42, b42=b42)

        # the closed-form consistency solve runs in f32 regardless of the
        # network dtype: it is a handful of elementwise ops at OS=1
        # (HBM-bound, negligible next to the conv stack) and its
        # sigmoid/divide chain is the last place bf16 rounding can still
        # move an output pixel before pasting.
        #
        # On the packed path the solve runs IN THE 16-PACK LAYOUT (a pure
        # per-pixel reorder, blk-major x channel-minor, so reshape to
        # [..., 16, 7] groups each full-res pixel's 7 channels): alpha, F,
        # and B then unpack independently, and a consumer that only reads
        # alpha (the streaming matte path) leaves the two 48-channel F/B
        # unpacks as dead code — 6/7 of the old 112-channel unpack cost.
        # s4d(img) is the same subgraph the tail's ex-part packing builds,
        # so XLA CSEs it.
        if _tail_fast_ok(h4, ex_parts) and not BISECT_SOLVE_FULLRES:
            e = _fba_tail_packed(h4, conv_out[-5], ex_parts, p)
            n, hq, wq, c_pk = e.shape
            ph = c_pk // 7                      # pack phases (4 or 16)
            e = e.astype(jnp.float32).reshape(n, hq, wq, ph, 7)
            img_pk = (sp.s2d(img) if ph == 4 else sp.s4d(img)).astype(
                jnp.float32).reshape(n, hq, wq, ph, 3)
            alpha = jnp.clip(e[..., 0:1], 0, 1)
            F = jax.nn.sigmoid(e[..., 1:4])
            B = jax.nn.sigmoid(e[..., 4:7])
            alpha, F, B = fba_fusion(alpha, img_pk, F, B)
            if packed_alpha:
                a = alpha.reshape(n, hq, wq, ph)
                return sp.s2d(a) if ph == 4 else a    # s4d == s2d o s2d
            unpk = sp.d2s if ph == 4 else sp.d4s
            unpack = lambda t: unpk(t.reshape(n, hq, wq, -1),
                                    prefer_reshape=True)
            return jnp.concatenate(
                [unpack(alpha), unpack(F), unpack(B)], axis=-1)

        out = _fba_tail(h4, conv_out[-5], ex_parts, p).astype(jnp.float32)
        img32 = img.astype(jnp.float32)
        alpha = jnp.clip(out[..., 0:1], 0, 1)
        F = jax.nn.sigmoid(out[..., 1:4])
        B = jax.nn.sigmoid(out[..., 4:7])
        alpha, F, B = fba_fusion(alpha, img32, F, B)
        if packed_alpha:
            return sp.s4d(alpha, prefer_reshape=True)
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
