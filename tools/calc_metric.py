#!/usr/bin/env python
"""Offline metric calculator (reference calc_metric.py), device-accelerated.

Discovers fully-predicted videos from frame_corr.json, computes
SAD/MSE/SSDA per frame and dtSSD/MESSDdt against the next frame via the
quantized flow PNGs, and writes the nested per-frame/per-video/global
metric.json. The metric math runs as one jitted kernel per frame pair
(tcvom_tpu.ops.metrics) — PNG decoding stays on host threads.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:
    cv2 = None

import jax
import jax.numpy as jnp

from tcvom_tpu.data.vmd import read_flow_png
from tcvom_tpu.ops.metrics import frame_metrics

METRIC_KEYS = ["mSAD", "MSE", "SSDA", "dtSSD", "MESSDdt_fix", "MESSDdt"]


def discover_frames(pred_dir: str, data_dir: str):
    """Videos with every frame predicted, then (cur, next-or-'') pairs
    (reference calc_metric.py:131-176)."""
    with open(os.path.join(data_dir, "frame_corr.json")) as f:
        fdict = json.load(f)
    exists = {}
    for fkey in sorted(fdict):
        fn = os.path.splitext(fkey)[0]
        exists[fkey] = (os.path.exists(os.path.join(pred_dir, fn + "_pred.png"))
                        and os.path.exists(os.path.join(pred_dir, fn + "_tri.png")))
    videos, current, full = [], "", True
    for fkey in sorted(fdict):
        d = os.path.dirname(fkey)
        if d != current:
            if full and current:
                videos.append(current)
            current, full = d, True
        if not exists[fkey]:
            full = False
    if full and current:
        videos.append(current)
    frames = [f for f in sorted(exists) if exists[f]
              and os.path.dirname(f) in set(videos)]
    pairs = []
    for i, cf in enumerate(frames):
        nf = frames[i + 1] if i + 1 < len(frames) else ""
        if nf and os.path.dirname(nf) != os.path.dirname(cf):
            nf = ""
        pairs.append((cf, nf))
    return videos, pairs


def read_frame(pred_dir, data_dir, fkey):
    fn = os.path.splitext(fkey)[0]
    a = cv2.imread(os.path.join(pred_dir, fn + "_pred.png"), cv2.IMREAD_GRAYSCALE)
    t = cv2.imread(os.path.join(pred_dir, fn + "_tri.png"), cv2.IMREAD_GRAYSCALE)
    g = cv2.imread(os.path.join(data_dir, "FG_done", fkey), cv2.IMREAD_UNCHANGED)[..., -1]
    return (np.float32(a) / 255.0, np.float32(t), np.float32(g) / 255.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--vis", action="store_true",
                   help="write per-frame error visualizations (red error "
                        "overlay | gt, trimap inset) like the reference")
    p.add_argument("--n_threads", type=int, default=8)
    args = p.parse_args()

    videos, pairs = discover_frames(args.pred, args.data)
    print("Present videos:", videos)

    def load_pair(pair):
        cf, nf = pair
        a, t, g = read_frame(args.pred, args.data, cf)
        if nf:
            ha, _, hg = read_frame(args.pred, args.data, nf)
            dn = os.path.dirname(cf)
            cb = os.path.splitext(os.path.basename(cf))[0]
            nb = os.path.splitext(os.path.basename(nf))[0]
            flow = read_flow_png(os.path.join(
                args.data, "flow_png", dn, f"flow_{cb}_{nb}.png"))
            hvalid = np.float32(1.0)
        else:
            ha, hg = np.zeros_like(a), np.zeros_like(g)
            flow = np.full(a.shape + (2,), np.nan, np.float32)
            hvalid = np.float32(0.0)
        return cf, (a, g, t, ha, hg, hvalid, flow)

    def write_vis(cf, a, g, t, m):
        """Error visualization (reference calc_metric.py:103-126): red
        error overlay beside the gt, trimap inset, and the SAD/MSE/valid
        pixel-count caption burned into a bottom border strip."""
        outdir = os.path.join(args.pred, "vis")
        os.makedirs(os.path.join(outdir, os.path.dirname(cf)), exist_ok=True)
        a8 = np.uint8(a * 255)
        g8 = np.uint8(g * 255)
        diff = np.abs(a.astype(np.float32) - g)[..., None]
        left = np.stack([a8] * 3, -1).astype(np.float32) / 255.0
        left[..., 2] = diff[..., 0] + (1 - diff[..., 0]) * left[..., 2]
        comp = np.concatenate([np.uint8(left * 255),
                               np.stack([g8] * 3, -1)], axis=1)
        tv = cv2.resize(np.uint8(t), (g.shape[1] // 4, g.shape[0] // 4),
                        interpolation=cv2.INTER_NEAREST)
        x0 = comp.shape[1] // 2 - tv.shape[1] // 2
        comp[-tv.shape[0]:, x0:x0 + tv.shape[1]] = np.stack([tv] * 3, -1)
        # metric caption on a blue bottom strip (calc_metric.py:120-126)
        comp = cv2.copyMakeBorder(comp, 0, 100, 0, 0, cv2.BORDER_CONSTANT,
                                  value=(255, 0, 0))
        caption = "SAD={:.6f} MSE={:.6f} valid_pxs={}".format(
            m["mSAD"], m["MSE"], int(m["pixel_count"]))
        comp = cv2.putText(comp, caption, (20, comp.shape[0] - 20),
                           cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 255, 0), 3)
        fn = os.path.splitext(cf)[0]
        cv2.imwrite(os.path.join(outdir, fn + ".png"), comp)

    results = {}
    with ThreadPoolExecutor(args.n_threads) as ex:
        for cf, arrs in ex.map(load_pair, pairs):
            out = frame_metrics(*[jnp.asarray(x) for x in arrs])
            results[cf] = {k: float(v) for k, v in jax.device_get(out).items()}
            if args.vis:
                write_vis(cf, arrs[0], arrs[1], arrs[2], results[cf])
            print(cf)

    # aggregate per video, then globally (calc_metric.py:190-233)
    agg = {"avg": {}, "all": {}}
    allres = {k: 0.0 for k in METRIC_KEYS}
    for v in videos:
        vres = {k: 0.0 for k in METRIC_KEYS}
        vres.update(pixel_count=0, flow_pixel_count=0)
        frames_v = {cf: m for cf, m in results.items() if os.path.dirname(cf) == v}
        for m in frames_v.values():
            for k in vres:
                vres[k] += m[k]
        n = max(len(frames_v), 1)
        for k in METRIC_KEYS:
            vres[k] /= float(n)
        agg["all"][v] = {"avg": vres, "all": frames_v}
        for k in METRIC_KEYS:
            allres[k] += vres[k]
    for k in METRIC_KEYS:
        allres[k] /= float(max(len(videos), 1))
    agg["avg"] = allres

    output = args.output or os.path.join(args.pred, "metric.json")
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    with open(output, "w") as f:
        json.dump(agg, f, indent=4, sort_keys=True)
    print(json.dumps(allres, indent=2))


if __name__ == "__main__":
    main()
