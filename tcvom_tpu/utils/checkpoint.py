"""Checkpoint save/restore via orbax + the staged-load flow.

Replaces the reference's per-epoch ``torch.save`` pair and strict=False
partial loads (train_ddp.py:261-268, 331-343). Checkpoints hold the full
TrainState (params, model_state, opt_state, step); ``load_weights``
supports loading converted torch checkpoints or our own, with
missing/unexpected key reporting.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:         # pragma: no cover
    _HAS_ORBAX = False

from tcvom_tpu.utils.convert import (convert_state_dict, merge_variables,
                                     widen_conv_in_channels)


def save_checkpoint(path: str, state) -> None:
    """Save a TrainState (or any pytree) to ``path`` (directory)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    else:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, state), f)


def restore_checkpoint(path: str, target=None):
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path, item=target)
    with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as f:
        return pickle.load(f)


def restore_train_state(path: str, state):
    """Restore a FULL TrainState (params + model_state + opt_state + step)
    saved by ``save_checkpoint`` — the reference's optimizer-resume path
    (train_ddp.py:300-304, ``optimizer.load_state_dict`` + start step).

    ``state`` is the freshly-initialized TrainState used as the structure
    template: orbax restores into it (``item=``), so optax NamedTuples /
    MaskedNode placeholders round-trip instead of degrading to plain
    lists/dicts. The pickle fallback preserves structure by construction;
    both paths are re-flattened into the template's treedef so a resumed
    state is structurally identical to a fresh one.
    """
    template = {"step": state.step, "params": state.params,
                "model_state": state.model_state,
                "opt_state": state.opt_state}
    template_np = jax.tree.map(np.asarray, template)
    raw = restore_checkpoint(path, target=template_np)

    tdef = jax.tree.structure(template)
    leaves = jax.tree.leaves(raw)
    want = jax.tree.leaves(template)
    if len(leaves) != len(want):
        raise ValueError(
            f"checkpoint at {path} has {len(leaves)} leaves; current "
            f"TrainState has {len(want)} — model/optimizer config changed "
            "since the checkpoint was written (use TRAIN.LOAD_CKPT for a "
            "weights-only partial load)")
    for l, w in zip(leaves, want):
        if np.shape(l) != np.shape(w):
            raise ValueError(
                f"checkpoint leaf shape {np.shape(l)} != expected "
                f"{np.shape(w)} at {path}")
    restored = jax.tree.unflatten(tdef, leaves)
    return state.replace(step=jnp.asarray(restored["step"], jnp.int32),
                         params=restored["params"],
                         model_state=restored["model_state"],
                         opt_state=restored["opt_state"])


def load_imagenet_encoder(model_name: str, init_variables: dict,
                          ckpt_path: str, logger=None):
    """Initialize the backbone encoder from a torch ImageNet ResNet
    state_dict (reference train_single_ddp.py:186-196): keys are treated
    as ``encoder.*``, the stem conv is widened with zero-init extra input
    channels to the model's stem width, and the result is merged with
    strict=False semantics (missing/unexpected key report).

    Works for the resnet-stem backbones (fba: resnet50; gca: resnet-D-29
    shares the layerN.M.convK naming). BatchNorm running stats in the
    torch dict are dropped where the model uses GroupNorm (fba).
    """
    import torch
    sd = torch.load(ckpt_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {"encoder." + k: v for k, v in sd.items()}
    loaded, unmatched = convert_state_dict(model_name, sd)
    if unmatched and logger:
        logger.info("ImageNet init: unconverted torch keys: %s",
                    sorted(unmatched))

    # widen the stem kernel to the model's input width (RGB + trimap chans).
    # The stem is matched EXPLICITLY at the top of the encoder (not by a
    # recursive name search — a residual block's conv1, e.g.
    # encoder/layer1_0/conv1, must not shadow it): it is the first
    # encoder child among the known per-backbone stem module names.
    def find_stem(tree):
        enc = tree.get("encoder", {})
        for stem_name in ("conv1", "block11", "layer0"):
            node = enc.get(stem_name)
            if not isinstance(node, dict):
                continue
            for leaf in ("kernel", "kernel_bar"):
                if leaf in node:
                    return ("encoder", stem_name, leaf)
            # one nested level (e.g. index: encoder/layer0/conv/kernel)
            for sub, v in node.items():
                if isinstance(v, dict):
                    for leaf in ("kernel", "kernel_bar"):
                        if leaf in v:
                            return ("encoder", stem_name, sub, leaf)
        return None

    params = loaded.get("params", {})
    stem_path = find_stem(params)
    if stem_path is None and logger:
        logger.info("ImageNet init: no stem conv found under encoder/ — "
                    "stem widening skipped")
    if stem_path:
        node, tgt = params, init_variables.get("params", {})
        for p in stem_path[:-1]:
            node = node[p]
            tgt = tgt.get(p, {})
        leaf = stem_path[-1]
        want_in = np.shape(tgt.get(leaf, node[leaf]))[2]
        have_in = np.shape(node[leaf])[2]
        if want_in > have_in:
            node[leaf] = widen_conv_in_channels(
                np.asarray(node[leaf]), want_in)
            if logger:
                logger.info("ImageNet init: widened %s input %d -> %d "
                            "(zero-init extra channels)",
                            "/".join(stem_path[:-1]), have_in, want_in)

    merged, missing, unexpected = merge_variables(init_variables, loaded)
    if logger:
        logger.info("ImageNet init from %s — missing: %d, unexpected: %d",
                    ckpt_path, len(missing), len(unexpected))
        logger.info("Missing keys: %s", sorted(missing)[:20])
        logger.info("Unexpected keys: %s", sorted(unexpected)[:20])
    return merged, missing, unexpected


def load_weights(model_name: str, init_variables: dict, ckpt_path: str,
                 logger=None):
    """Load model weights from either a torch ``.pth`` state_dict or one of
    our orbax/pickle checkpoints, partially (strict=False semantics),
    reporting missing/unexpected keys like train_ddp.py:263-267."""
    if ckpt_path.endswith((".pth", ".pth.tar", ".pt")):
        import torch
        sd = torch.load(ckpt_path, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
        loaded, unmatched = convert_state_dict(model_name, sd)
        if unmatched and logger:
            logger.info("Unconverted torch keys: %s", sorted(unmatched))
    else:
        loaded = restore_checkpoint(ckpt_path)
        # accept a full TrainState dump or raw variables
        if isinstance(loaded, dict) and "params" in loaded and "model_state" in loaded:
            loaded = {"params": loaded["params"], **loaded["model_state"]}
    merged, missing, unexpected = merge_variables(init_variables, loaded)
    if logger:
        logger.info("Missing keys: %s", sorted(missing))
        logger.info("Unexpected keys: %s", sorted(unexpected))
    return merged, missing, unexpected
