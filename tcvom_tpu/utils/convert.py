"""PyTorch checkpoint -> flax variables converter.

Translates reference TCVOM checkpoints (``*_SINGLE_Lim.pth``,
``*_TAM_Lim_Ltc_Laf.pth`` — the ``model.module.NET.state_dict()`` saved by
train_ddp.py:338) into this framework's parameter pytrees, so users of the
reference can bring their trained weights along.

Layout transforms:
- conv weight           OIHW -> HWIO
- conv-transpose weight IOHW -> HW-in-out
- BatchNorm running stats -> ``batch_stats`` collection
- SpectralNorm weight_u/weight_v -> ``spectral`` collection

Partial loads report missing/unexpected keys like the reference's
``load_state_dict(strict=False)`` logging (train_ddp.py:263-267).
"""
from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))      # OIHW -> HWIO


def _tconv_w(w):
    return np.transpose(w, (2, 3, 0, 1))      # IOHW -> HW(in)(out)


# kind -> {torch param suffix: (collection, flax leaf name, transform)}
_KINDS = {
    "conv": {
        "weight": ("params", "kernel", _conv_w),
        "bias": ("params", "bias", None),
    },
    "bn": {
        "weight": ("params", "scale", None),
        "bias": ("params", "bias", None),
        "running_mean": ("batch_stats", "mean", None),
        "running_var": ("batch_stats", "var", None),
        "num_batches_tracked": (None, None, None),
    },
    "gn": {
        "weight": ("params", "scale", None),
        "bias": ("params", "bias", None),
    },
    "sn": {
        "module.weight_bar": ("params", "kernel_bar", _conv_w),
        "module.weight_u": ("spectral", "u", None),
        "module.weight_v": ("spectral", "v", None),
        "module.bias": ("params", "bias", None),
    },
    "sn_t": {
        "module.weight_bar": ("params", "kernel_bar", _tconv_w),
        "module.weight_u": ("spectral", "u", None),
        "module.weight_v": ("spectral", "v", None),
        "module.bias": ("params", "bias", None),
    },
}

_SUFFIXES = sorted(
    {s for kind in _KINDS.values() for s in kind}, key=len, reverse=True)

Rule = tuple[str, str, Any]  # (regex on module path, kind, flax path template)


def _fam_rules(flax_prefix: str) -> list[Rule]:
    return [(r"^fam\.(key|query|value)_conv$", "conv",
             flax_prefix + r"fam/\1_conv")]


def _dim_rules(vmn: bool) -> list[Rule]:
    enc = "encoder." if vmn else ""
    dec = "decoder." if vmn else ""
    rules = [
        (rf"^{enc}conv([1-5])([1-3])$", "conv", r"encoder/block\1\2/conv"),
        (rf"^{enc}bn([1-5])([1-3])$", "bn", r"encoder/block\1\2/bn"),
        (rf"^{enc}conv6$", "conv", r"encoder/conv6"),
        (rf"^{dec}(dconv[1-6]|alpha_pred)$", "conv", r"decoder/\1"),
    ]
    if vmn:
        rules += [(r"^decoder\.fam\.(key|query|value)_conv$", "conv",
                   r"fam/\1_conv")]
    return rules


_INDEX_IR_EXPAND1 = {"0": ("dw", "conv"), "1": ("dw_bn", "bn"),
                     "3": ("pw_linear", "conv"), "4": ("pw_linear_bn", "bn")}
_INDEX_IR_EXPAND6 = {"0": ("pw", "conv"), "1": ("pw_bn", "bn"),
                     "3": ("dw", "conv"), "4": ("dw_bn", "bn"),
                     "6": ("pw_linear", "conv"), "7": ("pw_linear_bn", "bn")}


def _index_rules() -> list[Rule]:
    rules: list[Rule] = [
        (r"^encoder\.layer0\.0$", "conv", r"encoder/layer0/conv"),
        (r"^encoder\.layer0\.1$", "bn", r"encoder/layer0/bn"),
        (r"^encoder\.index(\d)\.indexnet(\d)\.0$", "conv",
         r"encoder/index\1/indexnet\2_conv0"),
        (r"^encoder\.index(\d)\.indexnet(\d)\.1$", "bn",
         r"encoder/index\1/indexnet\2_bn"),
        (r"^encoder\.index(\d)\.indexnet(\d)\.3$", "conv",
         r"encoder/index\1/indexnet\2_conv1"),
        (r"^encoder\.dconv_pp\.aspp1\.atrous_conv\.0$", "conv",
         r"encoder/dconv_pp/aspp1_conv"),
        (r"^encoder\.dconv_pp\.aspp1\.atrous_conv\.1$", "bn",
         r"encoder/dconv_pp/aspp1_bn"),
        (r"^encoder\.dconv_pp\.aspp([234])\.atrous_conv\.0$", "conv",
         r"encoder/dconv_pp/aspp\1_dw"),
        (r"^encoder\.dconv_pp\.aspp([234])\.atrous_conv\.1$", "bn",
         r"encoder/dconv_pp/aspp\1_dw_bn"),
        (r"^encoder\.dconv_pp\.aspp([234])\.atrous_conv\.3$", "conv",
         r"encoder/dconv_pp/aspp\1_pw"),
        (r"^encoder\.dconv_pp\.aspp([234])\.atrous_conv\.4$", "bn",
         r"encoder/dconv_pp/aspp\1_pw_bn"),
        (r"^encoder\.dconv_pp\.global_avg_pool\.1$", "conv",
         r"encoder/dconv_pp/global_conv"),
        (r"^encoder\.dconv_pp\.global_avg_pool\.2$", "bn",
         r"encoder/dconv_pp/global_bn"),
        (r"^encoder\.dconv_pp\.bottleneck_conv\.0$", "conv",
         r"encoder/dconv_pp/bottleneck_conv"),
        (r"^encoder\.dconv_pp\.bottleneck_conv\.1$", "bn",
         r"encoder/dconv_pp/bottleneck_bn"),
        (r"^decoder\.decoder_layer(\d)\.dconv\.0$", "conv",
         r"decoder/decoder_layer\1/dconv/conv"),
        (r"^decoder\.decoder_layer(\d)\.dconv\.1$", "bn",
         r"decoder/decoder_layer\1/dconv/bn"),
        (r"^decoder\.pred\.0\.0$", "conv", r"decoder/pred/p0/conv"),
        (r"^decoder\.pred\.0\.1$", "bn", r"decoder/pred/p0/bn"),
        (r"^decoder\.pred\.1$", "conv", r"decoder/pred/p1"),
        (r"^decoder\.fam\.(key|query|value)_conv$", "conv", r"fam/\1_conv"),
    ]
    # inverted residual layers: expand ratio 1 for layer1, 6 otherwise
    for li in range(1, 8):
        table = _INDEX_IR_EXPAND1 if li == 1 else _INDEX_IR_EXPAND6
        for j, (flax_name, kind) in table.items():
            rules.append((rf"^encoder\.layer{li}\.(\d+)\.conv\.{j}$", kind,
                          rf"encoder/layer{li}_\1/{flax_name}"))
    return rules


def _gca_rules() -> list[Rule]:
    rules: list[Rule] = []
    # encoder stem + layers
    rules += [
        (r"^encoder\.conv([123])$", "sn", r"encoder/conv\1"),
        (r"^encoder\.bn([123])$", "bn", r"encoder/bn\1"),
        (r"^encoder\.(layer\d|layer_bottleneck)\.(\d+)\.conv([12])$", "sn",
         r"encoder/\1_\2/conv\3"),
        (r"^encoder\.(layer\d|layer_bottleneck)\.(\d+)\.bn([12])$", "bn",
         r"encoder/\1_\2/bn\3"),
        # downsample: Sequential(AvgPool, SNConv, BN) for stride 2
        (r"^encoder\.(layer\d|layer_bottleneck)\.(\d+)\.downsample\.1$", "sn",
         r"encoder/\1_\2/ds_conv"),
        (r"^encoder\.(layer\d|layer_bottleneck)\.(\d+)\.downsample\.2$", "bn",
         r"encoder/\1_\2/ds_bn"),
        # channel-change-only downsample (Sequential(SNConv, BN)): layer1
        (r"^encoder\.(layer\d|layer_bottleneck)\.(\d+)\.downsample\.0$", "sn",
         r"encoder/\1_\2/ds_conv"),
        (r"^encoder\.guidance_head\.1$", "sn", r"encoder/guidance0"),
        (r"^encoder\.guidance_head\.5$", "sn", r"encoder/guidance1"),
        (r"^encoder\.guidance_head\.9$", "sn", r"encoder/guidance2"),
        (r"^encoder\.guidance_head\.3$", "bn", r"encoder/guidance_bn0"),
        (r"^encoder\.guidance_head\.7$", "bn", r"encoder/guidance_bn1"),
        (r"^encoder\.guidance_head\.11$", "bn", r"encoder/guidance_bn2"),
        (r"^encoder\.shortcut\.(\d)\.0$", "sn", r"encoder/shortcut\1/conv1"),
        (r"^encoder\.shortcut\.(\d)\.2$", "bn", r"encoder/shortcut\1/bn1"),
        (r"^encoder\.shortcut\.(\d)\.3$", "sn", r"encoder/shortcut\1/conv2"),
        (r"^encoder\.shortcut\.(\d)\.5$", "bn", r"encoder/shortcut\1/bn2"),
        (r"^encoder\.gca\.guidance_conv$", "conv", r"encoder/gca/guidance_conv"),
        (r"^encoder\.gca\.W\.0$", "conv", r"encoder/gca/W_conv"),
        (r"^encoder\.gca\.W\.1$", "bn", r"encoder/gca/W_bn"),
    ]
    # decoder: first block of each layer has a transpose conv1
    rules += [
        (r"^decoder\.(layer\d)\.0\.conv1$", "sn_t", r"decoder/\1_0/conv1"),
        (r"^decoder\.(layer\d)\.(\d+)\.conv1$", "sn", r"decoder/\1_\2/conv1"),
        (r"^decoder\.(layer\d)\.(\d+)\.conv2$", "sn", r"decoder/\1_\2/conv2"),
        (r"^decoder\.(layer\d)\.(\d+)\.bn([12])$", "bn", r"decoder/\1_\2/bn\3"),
        (r"^decoder\.(layer\d)\.(\d+)\.upsample\.1$", "sn",
         r"decoder/\1_\2/up_conv"),
        (r"^decoder\.(layer\d)\.(\d+)\.upsample\.2$", "bn",
         r"decoder/\1_\2/up_bn"),
        (r"^decoder\.conv1$", "sn_t", r"decoder/conv1"),
        (r"^decoder\.bn1$", "bn", r"decoder/bn1"),
        (r"^decoder\.conv2$", "conv", r"decoder/conv2"),
        (r"^decoder\.gca\.guidance_conv$", "conv", r"decoder/gca/guidance_conv"),
        (r"^decoder\.gca\.W\.0$", "conv", r"decoder/gca/W_conv"),
        (r"^decoder\.gca\.W\.1$", "bn", r"decoder/gca/W_bn"),
        (r"^decoder\.fam\.(key|query|value)_conv$", "conv", r"fam/\1_conv"),
    ]
    return rules


def _fba_rules() -> list[Rule]:
    return [
        (r"^encoder\.conv1$", "conv", r"encoder/conv1"),
        (r"^encoder\.bn1$", "gn", r"encoder/bn1"),
        (r"^encoder\.(layer\d)\.(\d+)\.conv([123])$", "conv",
         r"encoder/\1_\2/conv\3"),
        (r"^encoder\.(layer\d)\.(\d+)\.bn([123])$", "gn",
         r"encoder/\1_\2/bn\3"),
        (r"^encoder\.(layer\d)\.(\d+)\.downsample\.0$", "conv",
         r"encoder/\1_\2/ds_conv"),
        (r"^encoder\.(layer\d)\.(\d+)\.downsample\.1$", "gn",
         r"encoder/\1_\2/ds_bn"),
        (r"^decoder\.ppm\.(\d)\.1$", "conv", r"decoder/ppm/pool\1_conv"),
        (r"^decoder\.ppm\.(\d)\.2$", "gn", r"decoder/ppm/pool\1_bn"),
        (r"^decoder\.conv_up1\.0$", "conv", r"decoder/up1_0_conv"),
        (r"^decoder\.conv_up1\.1$", "gn", r"decoder/up1_0_bn"),
        (r"^decoder\.conv_up1\.3$", "conv", r"decoder/up1_1_conv"),
        (r"^decoder\.conv_up1\.4$", "gn", r"decoder/up1_1_bn"),
        (r"^decoder\.conv_up2\.0$", "conv", r"decoder/up2_conv"),
        (r"^decoder\.conv_up2\.1$", "gn", r"decoder/up2_bn"),
        (r"^decoder\.conv_up3\.0$", "conv", r"decoder/up3_conv"),
        (r"^decoder\.conv_up3\.1$", "gn", r"decoder/up3_bn"),
        (r"^decoder\.conv_up4\.0$", "conv", r"decoder/up4_0"),
        (r"^decoder\.conv_up4\.2$", "conv", r"decoder/up4_1"),
        (r"^decoder\.conv_up4\.4$", "conv", r"decoder/up4_2"),
        (r"^decoder\.fam\.(key|query|value)_conv$", "conv", r"fam/\1_conv"),
    ]


def get_rules(model_name: str) -> list[Rule]:
    vmn = model_name.startswith("vmn")
    method = model_name[model_name.rfind("_") + 1:]
    if method == "dim":
        return _dim_rules(vmn)
    if method == "index":
        return _index_rules()
    if method == "gca":
        return _gca_rules()
    if method == "fba":
        return _fba_rules()
    raise ValueError(model_name)


def _set_path(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(model_name: str, state_dict: dict) -> tuple[dict, list[str]]:
    """Convert a torch state_dict (str -> array-like) to flax variables.

    Returns (variables, unmatched_torch_keys). Tensors are converted with
    ``np.asarray`` so torch tensors work directly.
    """
    rules = [(re.compile(p), kind, tmpl) for p, kind, tmpl in get_rules(model_name)]
    out: dict[str, dict] = {}
    unmatched = []
    for key, val in state_dict.items():
        suffix = None
        for s in _SUFFIXES:
            if key.endswith("." + s):
                suffix = s
                break
        if suffix is None:
            unmatched.append(key)
            continue
        prefix = key[: -len(suffix) - 1]
        hit = False
        for pat, kind, tmpl in rules:
            m = pat.match(prefix)
            if not m:
                continue
            if suffix not in _KINDS[kind]:
                continue
            coll, leaf, tf = _KINDS[kind][suffix]
            hit = True
            if coll is None:
                break
            arr = np.asarray(val)
            if tf is not None:
                arr = tf(arr)
            flax_path = m.expand(tmpl).split("/") + [leaf]
            _set_path(out.setdefault(coll, {}), flax_path, arr)
            break
        if not hit:
            unmatched.append(key)
    return out, unmatched


def widen_conv_in_channels(kernel_hwio: np.ndarray, new_in: int) -> np.ndarray:
    """Widen a conv kernel's input channels with zeros — the reference's
    checkpoint surgeries: FBA conv1 3->11 (models/FBA/models.py:47-64),
    ImageNet ResNet conv1 3->4/6 (train_single_ddp.py:186-196), GCA trimap
    channel zeroing (encoders/resnet_enc.py:101)."""
    kh, kw, cin, cout = kernel_hwio.shape
    assert new_in >= cin
    out = np.zeros((kh, kw, new_in, cout), kernel_hwio.dtype)
    out[:, :, :cin] = kernel_hwio
    return out


def merge_variables(init_vars: dict, loaded: dict):
    """Partial load: overlay ``loaded`` onto ``init_vars`` where paths match
    AND shapes agree. Returns (merged, missing_paths, unexpected_paths) —
    the strict=False load-report of the reference (train_ddp.py:263-267).
    """
    import jax

    flat_init = jax.tree_util.tree_flatten_with_path(init_vars)[0]
    init_paths = {tuple(str(getattr(p, "key", p)) for p in path): leaf
                  for path, leaf in flat_init}
    flat_loaded = jax.tree_util.tree_flatten_with_path(loaded)[0]
    loaded_paths = {tuple(str(getattr(p, "key", p)) for p in path): leaf
                    for path, leaf in flat_loaded}

    merged = {p: v for p, v in init_paths.items()}
    missing = sorted(set(init_paths) - set(loaded_paths))
    unexpected = sorted(set(loaded_paths) - set(init_paths))
    for p, v in loaded_paths.items():
        if p in init_paths:
            tgt = init_paths[p]
            if tuple(np.shape(v)) != tuple(np.shape(tgt)):
                unexpected.append(p)
                continue
            merged[p] = np.asarray(v, dtype=np.asarray(tgt).dtype)

    # rebuild nested dict
    tree: dict = {}
    for p, v in merged.items():
        _set_path(tree, list(p), v)
    return tree, missing, unexpected
