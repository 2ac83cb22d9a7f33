#!/usr/bin/env python
"""Single-frame baseline inference (reference pred_single.py): FullModel on
the center frame with synthesized trimaps; writes pred/tri PNGs and prints
inline mSAD / MSE over the unknown region.
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
from tcvom_tpu.infer.predict import (TRIMAP_DILATION, make_single_eval_step,
                                     write_pred_pngs)
from tcvom_tpu.models import registry
from tcvom_tpu.models.full_model import TaskConfig
from tcvom_tpu.train.trainer import MattingTrainer
from tcvom_tpu.utils.checkpoint import load_weights
from tcvom_tpu.utils.logging import print_loss_dict


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["gca", "dim", "fba", "index"])
    p.add_argument("--data", required=True)
    p.add_argument("--load", required=True)
    p.add_argument("--n_threads", type=int, default=8)
    p.add_argument("--subset", action="store_true")
    p.add_argument("--save", default=None)
    p.add_argument("--trimap", required=True,
                   choices=["narrow", "medium", "wide"])
    p.add_argument("--image_shape", type=int, nargs=2, default=(1088, 1920))
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--dataset", default="vmd", choices=["vmd", "adobe"],
                   help="'adobe' evaluates on the DIM still-image set "
                        "(reference pred_single.py's Adobe val path)")
    p.add_argument("--val_mode", default="resize",
                   choices=["gca", "dim", "origin", "resize"])
    p.add_argument("--min_shape", type=int, default=800)
    p.add_argument("--vis", action="store_true",
                   help="write side-by-side pred|gt visualizations with a "
                        "trimap inset and SAD/MSE caption "
                        "(reference pred_single.py:194-208)")
    return p.parse_args()


def write_vis_image(vis_dir: str, fn: str, a8, g8, t8, sad, mse, pcount):
    """Side-by-side pred|gt, quarter-res trimap inset bottom-center, blue
    caption strip (reference pred_single.py:194-208)."""
    import cv2
    h, w = a8.shape
    vis_t = cv2.resize(t8, (w // 4, h // 4), interpolation=cv2.INTER_NEAREST)
    comp = cv2.hconcat([a8, g8])
    x0 = comp.shape[1] // 2 - vis_t.shape[1] // 2
    comp[-vis_t.shape[0]:, x0:x0 + vis_t.shape[1]] = vis_t
    comp = cv2.cvtColor(comp, cv2.COLOR_GRAY2BGR)
    comp = cv2.copyMakeBorder(comp, 0, 100, 0, 0, cv2.BORDER_CONSTANT,
                              value=(255, 0, 0))
    caption = "SAD={:.6f} MSE={:.6f} valid_pxs={}".format(sad, mse, pcount)
    comp = cv2.putText(comp, caption, (20, comp.shape[0] - 20),
                       cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 255, 0), 3)
    os.makedirs(os.path.join(vis_dir, os.path.dirname(fn)), exist_ok=True)
    cv2.imwrite(os.path.join(vis_dir, fn + ".png"), comp)


def main():
    args = parse_args()
    if args.save is None:
        args.save = "results/{}/{}/{}".format(
            "single_subset" if args.subset else "single", args.trimap,
            os.path.splitext(os.path.basename(args.load))[0])
    os.makedirs(args.save, exist_ok=True)

    cfg = TaskConfig(model=args.model,
                     dilate_radius=TRIMAP_DILATION[args.trimap])
    module = registry.build_model(args.model)

    if args.dataset == "adobe":
        from tcvom_tpu.data.dim import DIMEvalDataset
        dataset = DIMEvalDataset(data_root=args.data, val_mode=args.val_mode,
                                 min_shape=args.min_shape, plus1=False)
    else:
        dataset = VideoMattingDataset(
            data_root=args.data, image_shape=tuple(args.image_shape), mode="val",
            use_subset=args.subset, plus1=False, precomputed_val=args.data,
            sample_length=3, no_flow=True)
    loader = DataLoader(dataset, args.batch or max(1, len(jax.devices())),
                        shuffle=False, drop_last=False,
                        num_workers=args.n_threads)

    trainer = MattingTrainer(cfg, "single")
    sample = dataset[0]
    init_batch = {k: jnp.asarray(sample[k])[None] for k in ("a", "fg", "bg")}
    state = trainer.init_state(jax.random.PRNGKey(0), init_batch)
    variables, _, _ = load_weights(args.model, state.variables, args.load)

    # data-parallel inference over all chips (the reference used
    # nn.DataParallel, pred_single.py:94)
    from tcvom_tpu.parallel.mesh import make_mesh, pad_shard_batch, replicate
    mesh = make_mesh()
    variables = replicate(variables, mesh)

    step = make_single_eval_step(module, cfg)
    c = dataset.sample_length // 2
    key = jax.random.PRNGKey(1)
    msad, mse, count = 0.0, 0.0, 0
    for batch_np in loader:
        dev, b = pad_shard_batch(
            {k: batch_np[k] for k in ("a", "fg", "bg")}, mesh)
        key, sub = jax.random.split(key)
        losses, alphas, tris = step(variables, dev, sub)
        alphas, tris = np.asarray(alphas)[:b], np.asarray(tris)[:b]
        gts = batch_np["a"][:, c] / 255.0
        per_sample = []                      # (sad, mse, pcount) per i
        for i in range(alphas.shape[0]):
            t = tris[i, ..., 0]
            m = (t > 0) & (t < 1)
            if m.sum():
                d = alphas[i, ..., 0][m] - gts[i, ..., 0][m]
                s_i, e_i = float(np.mean(np.abs(d))), float(np.mean(d * d))
                msad += s_i
                mse += e_i
                count += 1
                per_sample.append((s_i, e_i, int(m.sum())))
            else:
                per_sample.append((0.0, 0.0, 0))
        if args.dataset == "adobe":
            names = ["{:05d}".format(int(i)) for i in batch_np["idx"]]
            if "og_shape" in batch_np:       # per-sample original sizes
                crop = [(int(h), int(w)) for h, w in batch_np["og_shape"]]
            else:
                crop = (alphas.shape[1], alphas.shape[2])
            write_pred_pngs(args.save, names, alphas, tris, crop_hw=crop)
        else:
            names = [dataset.samples[int(i)][c] for i in batch_np["idx"]]
            crop = (min(1080, alphas.shape[1]), alphas.shape[2])
            write_pred_pngs(args.save, names, alphas, tris, crop_hw=crop)
        if args.vis:
            vis_dir = os.path.join(args.save, "vis")
            for i, name in enumerate(names):
                h, w = crop[i] if isinstance(crop, list) else crop
                a8 = np.uint8(np.clip(alphas[i, :h, :w, 0], 0, 1) * 255)
                g8 = np.uint8(np.clip(gts[i, :h, :w, 0], 0, 1) * 255)
                t8 = np.uint8(np.clip(tris[i, :h, :w, 0], 0, 1) * 255)
                fn = os.path.splitext(name)[0]
                write_vis_image(vis_dir, fn, a8, g8, t8, *per_sample[i])
        print(names[-1])
    print_loss_dict({"mSAD": msad / max(count, 1), "MSE": mse / max(count, 1)},
                    os.path.join(args.save, "loss.log"))


if __name__ == "__main__":
    main()
