#!/usr/bin/env python
"""Wild-video inference from real trimaps (reference pred_test.py):
folders of NNNNN_rgb.png / NNNNN_trimap.png -> NNNNN_alpha.png.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tcvom_tpu.infer.predict import predict_test_folder
from tcvom_tpu.models import registry
from tcvom_tpu.models.full_model import TaskConfig
from tcvom_tpu.train.trainer import MattingTrainer
from tcvom_tpu.utils.checkpoint import load_weights


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["gca", "dim", "fba", "index"])
    p.add_argument("--vmn", action="store_true",
                   help="use the VMN temporal model (default single-frame)")
    p.add_argument("--load", required=True)
    p.add_argument("--data", required=True, help="input folder")
    p.add_argument("--save", required=True, help="output folder")
    p.add_argument("--agg_window", type=int, default=7)
    return p.parse_args()


def main():
    args = parse_args()
    name = ("vmn_" + args.model) if args.vmn else args.model
    cfg = TaskConfig(model=name, agg_window=args.agg_window)
    module = registry.build_model(name, agg_window=args.agg_window)

    # init with a probe sample to get variable structure
    from tcvom_tpu.infer.predict import TestFolder
    probe = TestFolder(args.data)[0]
    b = {"a": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (1,)),
         "fg": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (3,)),
         "bg": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (3,))}
    trainer = MattingTrainer(cfg, "vmd" if args.vmn else "single")
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    variables, _, _ = load_weights(name, state.variables, args.load)

    predict_test_folder(module, variables, cfg, args.data, args.save,
                        progress=lambda i, n: print(f"{i + 1}/{n}"))


if __name__ == "__main__":
    main()
