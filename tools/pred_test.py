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
    p.add_argument("--data", required=True,
                   help="a frame folder, or a root of per-video folders")
    p.add_argument("--save", required=True, help="output folder")
    p.add_argument("--agg_window", type=int, default=7)
    p.add_argument("--dilation", type=int, default=None,
                   help="extra unknown-region dilation radius applied to "
                        "the provided trimaps (reference pred_test.py:149; "
                        "the reference's dilate_kernel is a radius, "
                        "models/model.py:62-64)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (numerics pinned by bf16_guard.json)")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="process this process's static 1/N slice of the "
                        "video list, e.g. --shard 0/4 .. 3/4 — one process "
                        "per chip, the GSPMD analog of the reference's "
                        "mp.Process-per-GPU range sharding "
                        "(pred_test.py:124-137)")
    p.add_argument("videos", nargs="*",
                   help="video subfolders of --data to process (default: "
                        "all, or --data itself if it holds frames directly)")
    return p.parse_args()


def main():
    args = parse_args()
    name = ("vmn_" + args.model) if args.vmn else args.model
    cfg = TaskConfig(model=name, agg_window=args.agg_window,
                     dilate_radius=args.dilation)
    module = registry.build_model(name, agg_window=args.agg_window)

    # multi-video root (reference pred_test.py:19-29): outputs go to
    # save/<video>/; a folder holding *_rgb.png directly is a single run
    import glob
    if args.videos:
        runs = [(os.path.join(args.data, v), os.path.join(args.save, v))
                for v in args.videos]
    elif glob.glob(os.path.join(args.data, "*_rgb.png")):
        runs = [(args.data, args.save)]
    else:
        vids = sorted(d for d in os.listdir(args.data)
                      if os.path.isdir(os.path.join(args.data, d)))
        runs = [(os.path.join(args.data, v), os.path.join(args.save, v))
                for v in vids]
    if not runs:
        raise SystemExit(f"no videos found under {args.data}")

    if args.shard:
        # static contiguous range shard, same split as the reference's
        # per-GPU index ranges (pred_test.py:124-137): video v goes to
        # shard i iff i*len//n <= v < (i+1)*len//n
        try:
            i, n = (int(x) for x in args.shard.split("/"))
            assert 0 <= i < n
        except (ValueError, AssertionError):
            raise SystemExit(f"--shard must be I/N with 0<=I<N, "
                             f"got {args.shard!r}")
        lo, hi = i * len(runs) // n, (i + 1) * len(runs) // n
        print(f"shard {i}/{n}: videos [{lo}:{hi}] of {len(runs)}")
        runs = runs[lo:hi]
        if not runs:
            return

    # init with a probe sample to get variable structure
    from tcvom_tpu.infer.predict import TestFolder
    probe = TestFolder(runs[0][0])[0]
    b = {"a": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (1,)),
         "fg": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (3,)),
         "bg": jnp.zeros((1, 3) + tuple(probe["imgs"].shape[1:3]) + (3,))}
    trainer = MattingTrainer(cfg, "vmd" if args.vmn else "single")
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    variables, _, _ = load_weights(name, state.variables, args.load)

    for in_dir, out_dir in runs:
        print(f"== {in_dir} -> {out_dir}")
        predict_test_folder(module, variables, cfg, in_dir, out_dir,
                            progress=lambda i, n: print(f"{i + 1}/{n}"),
                            dtype=jnp.bfloat16 if args.bf16 else None)


if __name__ == "__main__":
    main()
