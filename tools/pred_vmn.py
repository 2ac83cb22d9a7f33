#!/usr/bin/env python
"""VideoMatting108 validation inference, full VMN model (reference
pred_vmn.py — note the reference README calls it pred_vmd.py).

Writes <frame>_pred.png / <frame>_tri.png pairs (1080p crop) + loss.log;
feed the output directory to tools/calc_metric.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tcvom_tpu.data.loader import DataLoader
from tcvom_tpu.data.vmd import VideoMattingDataset
from tcvom_tpu.infer.predict import (TRIMAP_DILATION, make_vmd_eval_step,
                                     write_pred_pngs)
from tcvom_tpu.models import registry
from tcvom_tpu.models.full_model import TaskConfig
from tcvom_tpu.utils.checkpoint import load_weights
from tcvom_tpu.utils.logging import print_loss_dict


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["gca", "dim", "fba", "index"])
    p.add_argument("--data", required=True, help="VideoMatting108 root")
    p.add_argument("--load", required=True, help="checkpoint (.pth or orbax)")
    p.add_argument("--n_threads", type=int, default=16)
    p.add_argument("--subset", action="store_true")
    p.add_argument("--save", default=None)
    p.add_argument("--trimap", required=True,
                   choices=["narrow", "medium", "wide"])
    p.add_argument("--agg_window", type=int, default=7)
    p.add_argument("--batch", type=int, default=None,
                   help="global batch (default: one per device)")
    p.add_argument("--image_shape", type=int, nargs=2, default=(1088, 1920),
                   help="padded network resolution (1080 % 32 != 0)")
    p.add_argument("--space", type=int, default=1,
                   help="shard the image H axis over this many chips per "
                        "batch element (single-stream multi-chip scaling; "
                        "GSPMD inserts the conv halos)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.save is None:
        args.save = "results/{}/{}/{}".format(
            "vmd_subset" if args.subset else "vmd", args.trimap,
            os.path.splitext(os.path.basename(args.load))[0])
    os.makedirs(args.save, exist_ok=True)

    model_name = "vmn_" + args.model
    cfg = TaskConfig(model=model_name, agg_window=args.agg_window,
                     dilate_radius=TRIMAP_DILATION[args.trimap])
    module = registry.build_model(model_name, agg_window=args.agg_window)

    dataset = VideoMattingDataset(
        data_root=args.data, image_shape=tuple(args.image_shape), mode="val",
        use_subset=args.subset, plus1=False, precomputed_val=args.data,
        sample_length=3, no_flow=True)
    batch = args.batch or max(1, len(jax.devices()))
    loader = DataLoader(dataset, batch, shuffle=False, drop_last=False,
                        num_workers=args.n_threads)

    # init + load
    sample = dataset[0]
    init_batch = {k: jnp.asarray(sample[k])[None] for k in ("a", "fg", "bg")}
    from tcvom_tpu.train.trainer import MattingTrainer
    trainer = MattingTrainer(cfg, "vmd")
    state = trainer.init_state(jax.random.PRNGKey(0), init_batch)
    variables, _, _ = load_weights(model_name, state.variables, args.load)

    # data-parallel inference over all chips (the reference used
    # nn.DataParallel, pred_vmn.py:85): params replicated, batch dim-0
    # sharded; GSPMD partitions the jitted step
    from tcvom_tpu.parallel.mesh import make_mesh, pad_shard_batch, replicate
    mesh = make_mesh(space=args.space)
    variables = replicate(variables, mesh)

    step = make_vmd_eval_step(module, cfg)
    c = dataset.sample_length // 2
    eval_loss = {k: 0.0 for k in
                 ["L_alpha", "L_comp", "L_grad", "L_dt", "L_att", "L_total"]}
    key = jax.random.PRNGKey(1)
    for batch_np in loader:
        # final partial batch: padded by repeating the last sample so every
        # chip gets work; preds are sliced back to b, and the LOSSES are
        # recomputed over only the real b samples (the reference's exact
        # per-batch accumulation — a padded-batch mean would double-count
        # the duplicated sample)
        dev, b = pad_shard_batch(
            {k: batch_np[k] for k in ("a", "fg", "bg")}, mesh,
            space_axis=2 if args.space > 1 else None)
        key, sub = jax.random.split(key)
        losses, alphas, tris = step(variables, dev, sub)
        alphas, tris = np.asarray(alphas)[:b], np.asarray(tris)[:b]
        if b < dev["a"].shape[0]:
            # unpadded re-run for exact tail-batch losses (one extra jit
            # specialization, once per sweep)
            real = {k: jnp.asarray(batch_np[k]) for k in ("a", "fg", "bg")}
            losses, _, _ = step(variables, real, sub)
        losses = jax.device_get(losses)
        lmap = dict(zip(["L_alpha", "L_comp", "L_grad"], ("L1", "L2", "L3")))
        for name, k in lmap.items():
            eval_loss[name] += float(losses[k]) * b
        eval_loss["L_dt"] += float(losses["L_dt"]) * b
        eval_loss["L_att"] += float(losses["L_att"]) * b
        eval_loss["L_total"] += sum(float(v) for v in losses.values()) * b
        names = [dataset.samples[int(i)][c] for i in batch_np["idx"]]
        crop = (min(1080, args.image_shape[0]), min(1920, args.image_shape[1]))
        write_pred_pngs(args.save, names, np.asarray(alphas), np.asarray(tris),
                        crop_hw=crop)
        print(f"{names[-1]}  " + " ".join(
            f"{k}={float(v):.4f}" for k, v in losses.items()))
    for k in eval_loss:
        eval_loss[k] /= float(len(dataset))
    print_loss_dict(eval_loss, os.path.join(args.save, "loss.log"))


if __name__ == "__main__":
    main()
