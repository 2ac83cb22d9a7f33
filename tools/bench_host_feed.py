#!/usr/bin/env python
"""End-to-end host-feed benchmark for the wild-video path (VERDICT #7).

bench.py measures the device-only matte rate from synthetic device arrays;
this tool measures what a user actually gets from ``pred_test``: PNG decode
-> device stream -> PNG encode, on real files. It synthesizes a 1080p clip
on disk (natural-image-like content so PNG codec cost is realistic), runs
``predict_test_folder`` once to compile, then times a full second pass and
reports fps including I/O, plus standalone per-frame decode/encode costs so
the pipeline overlap is auditable.

Reference context: the reference fed its GPUs with 8-16 DataLoader workers
(SYSTEM.NUM_WORKERS, train_ddp.py:233-240); its pred_test.py decoded each
frame triplet per output with no prefetch (pred_test.py:36-67).

    python tools/bench_host_feed.py [--frames 24] [--out HOSTFEED_r05.json]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import cv2
import jax.numpy as jnp
import numpy as np

cv2.setNumThreads(0)


def synth_frames(out_dir, frames, h, w, seed=0):
    """Moving soft disc over a smooth textured background — compresses like
    a natural frame (noise-free gradients + mid-frequency texture), so PNG
    decode/encode cost is representative, unlike raw noise."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    base = cv2.resize(rng.randint(0, 256, (h // 16, w // 16, 3), np.uint8),
                      (w, h), interpolation=cv2.INTER_CUBIC)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fg = rng.randint(100, 200, 3).astype(np.float32)
    for i in range(frames):
        cy, cx = h * 0.45 + 10 * i, w * 0.4 + 20 * i
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        alpha = np.clip((260.0 - d) / 120.0, 0, 1)[..., None]
        img = np.uint8(alpha * fg + (1 - alpha) * base)
        tri = np.uint8(np.where(alpha[..., 0] > 0.95, 255,
                                np.where(alpha[..., 0] < 0.05, 0, 128)))
        cv2.imwrite(os.path.join(out_dir, f"{i:05d}_rgb.png"), img)
        cv2.imwrite(os.path.join(out_dir, f"{i:05d}_trimap.png"), tri)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--model", default="vmn_fba")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--data", default="/tmp/hostfeed_clip")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[1] / "HOSTFEED_r05.json"))
    args = ap.parse_args()
    h, w = args.size

    from tcvom_tpu.infer.predict import predict_test_folder
    from tcvom_tpu.models import full_model as FM
    from tcvom_tpu.models import registry

    if not os.path.exists(os.path.join(args.data,
                                       f"{args.frames - 1:05d}_rgb.png")):
        shutil.rmtree(args.data, ignore_errors=True)
        t0 = time.perf_counter()
        synth_frames(args.data, args.frames, h, w)
        print(f"synthesized {args.frames} frames in "
              f"{time.perf_counter() - t0:.1f}s")

    # standalone codec costs (what the pipeline must hide)
    p_rgb = os.path.join(args.data, "00000_rgb.png")
    t0 = time.perf_counter()
    for _ in range(5):
        img = cv2.imread(p_rgb, cv2.IMREAD_COLOR)
    decode_ms = (time.perf_counter() - t0) / 5 * 1e3
    t0 = time.perf_counter()
    for _ in range(5):
        cv2.imwrite("/tmp/hostfeed_enc.png", img[..., :1])
    encode_ms = (time.perf_counter() - t0) / 5 * 1e3
    png_mb = os.path.getsize(p_rgb) / 1e6

    name = args.model
    cfg = FM.TaskConfig(model=name, agg_window=7)
    module = registry.build_model(name, agg_window=7)
    ph, pw = h + ((-h) % 32), w + ((-w) % 32)
    x = jnp.zeros((1, 3, ph, pw, 3 + cfg.trimap_channels), jnp.float32)
    masks = jnp.ones((1, 3, ph, pw, 1), jnp.float32)
    extras = ((jnp.zeros((1, 3, ph, pw, 3)), jnp.zeros((1, 3, ph, pw, 2)))
              if cfg.method == "fba" else None)
    variables = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x, masks, extras=extras, train=False))()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    # host<->device transfer microbenchmark: what one frame's traffic
    # costs through this backend (the axon tunnel serializes transfers
    # over a network hop; on a local backend these are PCIe/DMA rates).
    # Upload: the padded uint8 frame pair (~8+2.7 MB); download: the
    # quantized uint8 matte (~2.7 MB).
    up = np.zeros((1, ph, pw, 3), np.uint8)
    up_tri = np.zeros((1, ph, pw, 1), np.uint8)
    d = jax.device_put(up)
    d.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = jax.device_put(up).block_until_ready()
        _ = jax.device_put(up_tri).block_until_ready()
    upload_ms = (time.perf_counter() - t0) / 5 * 1e3
    down = jnp.zeros((1, ph, pw, 1), jnp.uint8) + 1
    down.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(down)
    download_ms = (time.perf_counter() - t0) / 5 * 1e3

    out_dir = "/tmp/hostfeed_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    predict_test_folder(module, variables, cfg, args.data, out_dir,
                        dtype=dtype)            # compile + warm pass
    warm_s = time.perf_counter() - t0
    n_out = len(os.listdir(out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    stats = predict_test_folder(module, variables, cfg, args.data, out_dir,
                                dtype=dtype)    # timed pass
    run_s = time.perf_counter() - t0
    assert len(os.listdir(out_dir)) == args.frames, os.listdir(out_dir)

    report = {
        "backend": jax.default_backend(),
        "model": name, "dtype": args.dtype, "frames": args.frames,
        "hw": [h, w], "png_mb_rgb": round(png_mb, 2),
        "decode_ms_rgb": round(decode_ms, 1),
        "encode_ms_alpha": round(encode_ms, 1),
        "upload_frame_ms": round(upload_ms, 1),
        "download_matte_ms": round(download_ms, 1),
        "warm_pass_s": round(warm_s, 2),
        "e2e_s": round(run_s, 2),
        "e2e_fps": round(args.frames / run_s, 2),
        "e2e_ms_per_frame": round(run_s / args.frames * 1e3, 1),
        "n_outputs": n_out,
        # per-phase wall-time breakdown (seconds summed over the run, per
        # thread): main_* is the dispatch loop, prod_read the decoder
        # thread, writer_* the writer thread. main_qget ~= decode-bound;
        # main_step ~= device/tunnel-bound; writer_fetch = matte readback.
        "phase_breakdown_s": {k: round(v, 2) for k, v in sorted(
            stats.items()) if k != "frames"},
        "phase_ms_per_frame": {k: round(v / args.frames * 1e3, 1)
                               for k, v in sorted(stats.items())
                               if k != "frames"},
    }
    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
