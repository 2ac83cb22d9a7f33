"""Configuration system: defaults + YAML overlay + CLI ``opts`` overrides.

Mirrors the reference's yacs schema (config.py:1-54) — same keys so the
reference's cfgs/*.yaml files work unchanged — without the yacs dependency.
"""
from __future__ import annotations

import copy
from typing import Any

import yaml

_DEFAULTS: dict[str, Any] = {
    "MODEL": "vmn_fba",
    "AGG_WINDOW": 7,
    "SYSTEM": {
        "NUM_WORKERS": 4,
        "RANDOM_SEED": -1,
        "OUTDIR": "train_log",
        "EXP_SUFFIX": "",
        # cudnn flags kept for config-file compatibility; ignored on TPU
        "CUDNN_BENCHMARK": True,
        "CUDNN_DETERMINISTIC": False,
        "CUDNN_ENABLED": True,
    },
    "DATASET": {
        "PATH": "",
        "SUBSET": False,
    },
    "TRAIN": {
        "LOAD_CKPT": "",
        "LOAD_OPT": "",
        "LOAD_IMAGENET": "",           # torch ResNet state_dict for encoder
                                       # init (train_single_ddp.py:186-196)
        "FREEZE_BACKBONE": False,
        "BATCH_SIZE_PER_GPU": 1,       # per-device batch (name kept for parity)
        "VAL_BATCH_SIZE_PER_GPU": 1,
        "BASE_LR": 5e-4,
        "LR_STRATEGY": "const",        # 'poly' or 'const'
        "WEIGHT_DECAY": 1e-4,
        "TRAIN_INPUT_SIZE": (512, 512),
        "VAL_INPUT_SIZE": (512, 512),
        "MIN_EDGE_LENGTH": 1088,
        "OPTIMIZER": "adam",
        "TOTAL_STEPS": 50,             # epochs, as in the reference
        "PRINT_FREQ": 10,
        "IMAGE_FREQ": 500,
        # TPU-native extension (no reference analog): bf16-compute training
        # — f32 master weights/optimizer, params+activations cast to bf16
        # inside the step. EXPERIMENTAL, off by default: the committed
        # guard (tools/validate_bf16_train.py -> BF16_TRAIN_GUARD.json)
        # FAILS its update-cosine gate — WS-conv weight gradients decohere
        # under bf16 activations and the effect is irreducible without f32
        # backward activations (see the tool docstring for the bisection).
        # Speed rows in BENCH_TRAIN_*.json (~11% step-time win measured).
        "BF16": False,
    },
}


class Config:
    """Nested attribute-style config (read-only after freeze())."""

    def __init__(self, d: dict):
        self._frozen = False
        for k, v in d.items():
            object.__setattr__(self, k, Config(v) if isinstance(v, dict) else v)

    def __setattr__(self, k, v):
        if getattr(self, "_frozen", False):
            raise AttributeError(f"Config is frozen; cannot set {k}")
        object.__setattr__(self, k, v)

    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.__dict__.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.__dict__.items():
            if k == "_frozen":
                continue
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def __repr__(self):
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    def dump(self, path: str):
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=True)


def _merge(base: dict, overlay: dict, path: str = ""):
    for k, v in overlay.items():
        if k not in base:
            raise KeyError(f"Unknown config key: {path}{k}")
        if isinstance(base[k], dict):
            _merge(base[k], v, path + k + ".")
        else:
            if isinstance(v, str) and not isinstance(base[k], str):
                # yacs compatibility: the reference's yaml files write
                # tuples as strings, e.g. "TRAIN_INPUT_SIZE: (512, 512)"
                import ast
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass
            if isinstance(base[k], tuple) and isinstance(v, list):
                v = tuple(v)
            base[k] = v
    return base


def _parse_value(s: Any):
    if not isinstance(s, str):
        return s
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def get_cfg_defaults() -> dict:
    return copy.deepcopy(_DEFAULTS)


def load_config(yaml_path: str | None = None, opts: list | None = None,
                frozen: bool = True) -> Config:
    """Defaults <- YAML file <- ['KEY.SUBKEY', value, ...] CLI pairs
    (the reference's merge_from_file / merge_from_list flow,
    train_ddp.py:367-370)."""
    d = get_cfg_defaults()
    if yaml_path:
        with open(yaml_path) as f:
            overlay = yaml.safe_load(f) or {}
        _merge(d, overlay)
    if opts:
        assert len(opts) % 2 == 0, "opts must be KEY VALUE pairs"
        for k, v in zip(opts[::2], opts[1::2]):
            parts = k.split(".")
            node = d
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"Unknown config key: {k}")
            cur = node[parts[-1]]
            val = _parse_value(v)
            if isinstance(cur, tuple) and isinstance(val, list):
                val = tuple(val)
            node[parts[-1]] = val
    cfg = Config(d)
    return cfg.freeze() if frozen else cfg
