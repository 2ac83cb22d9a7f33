#!/usr/bin/env python
"""Per-op TPU profile of the streaming 1080p inference step.

Captures a jax.profiler trace of the steady-state StreamingPredictor step
(encode + decode), parses the XPlane protobuf directly (the tensorboard
profile plugin's pywrap doesn't match this TF build), and aggregates
device-side op self-times into a ranked table — the data behind
PROFILE_r03.md's roofline discussion.

Usage:
    python tools/profile_ops.py [--dtype bf16] [--steps 10] [--top 25]
        [--out PROFILE_r03_ops.json]

The parse step runs in-process; xplane_pb2 needs the pure-python protobuf
implementation, so the tool re-execs itself with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if unset.
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import pathlib
import re
import sys
import tempfile

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def capture_trace(dtype_name: str, steps: int, trace_dir: str):
    from tcvom_tpu.infer.predict import StreamingPredictor
    from tcvom_tpu.models import full_model as FM
    from tcvom_tpu.models import registry

    name = "vmn_fba"
    cfg = FM.TaskConfig(model=name, agg_window=7)
    module = registry.build_model(name, agg_window=7)
    b, s, h, w = 1, 3, 1088, 1920
    x = jnp.zeros((b, s, h, w, 3 + cfg.trimap_channels), jnp.float32)
    masks = jnp.ones((b, s, h, w, 1), jnp.float32)
    extras = (jnp.zeros((b, s, h, w, 3)), jnp.zeros((b, s, h, w, 2)))
    variables = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x, masks, extras=extras, train=False))()

    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)))
    tri = np.zeros((b, h, w, 1), np.float32)
    tri[:, 300:800, 500:1400] = 128.0
    tri[:, 450:650, 700:1200] = 255.0
    tri = jax.device_put(jnp.asarray(tri))

    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    sp = StreamingPredictor(module, variables, cfg, dtype=dtype,
                            fgbg=False)
    # warm both jitted paths before tracing
    state, _ = sp.step(None, img, tri)
    state, _ = sp.step(state, img, tri)
    state, out = sp.step(state, img, tri)
    np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, out = sp.step(state, img, tri)
        np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return steps


def parse_xplane(trace_dir: str, steps: int, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = list(pathlib.Path(trace_dir).rglob("*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_meta = {i: m for i, m in plane.event_metadata.items()}
        agg = collections.defaultdict(lambda: [0.0, 0])   # name -> [ps, n]
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines etc. are coarser
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                if md is None:
                    continue
                a = agg[md.display_name or md.name]
                a[0] += ev.duration_ps
                a[1] += 1
        for name, (ps, n) in agg.items():
            rows.append({"plane": plane.name, "op": name,
                         "total_ms": ps / 1e9, "count": n})
    # keep the busiest plane's op rows (the device plane)
    by_plane = collections.defaultdict(float)
    for r in rows:
        by_plane[r["plane"]] += r["total_ms"]
    if not by_plane:
        return {"error": "no TPU plane found", "planes":
                [p.name for p in space.planes]}
    dev_plane = max(by_plane, key=by_plane.get)
    dev_rows = [r for r in rows if r["plane"] == dev_plane]
    dev_rows.sort(key=lambda r: -r["total_ms"])
    total = sum(r["total_ms"] for r in dev_rows)

    def classify(op):
        s = op.lower()
        if "fusion" in s or s.startswith("%fusion"):
            return "fusion"
        if "conv" in s:
            return "conv"
        if "dot" in s or "matmul" in s:
            return "dot"
        if "custom-call" in s or "pallas" in s or "tpu_custom_call" in s:
            return "custom(pallas)"
        if "copy" in s or "transpose" in s or "reshape" in s:
            return "data-movement"
        if "reduce" in s:
            return "reduce"
        return "other"

    cat = collections.defaultdict(float)
    for r in dev_rows:
        cat[classify(r["op"])] += r["total_ms"]

    return {
        "device_plane": dev_plane,
        "steps": steps,
        "device_total_ms_per_step": round(total / steps, 3),
        "category_ms_per_step": {k: round(v / steps, 3)
                                 for k, v in sorted(cat.items(),
                                                    key=lambda kv: -kv[1])},
        "top_ops": [{"op": r["op"][:120],
                     "ms_per_step": round(r["total_ms"] / steps, 3),
                     "count_per_step": r["count"] // steps,
                     "pct": round(100 * r["total_ms"] / total, 1)}
                    for r in dev_rows[:top]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="tpu_trace_")
    steps = capture_trace(args.dtype, args.steps, trace_dir)
    report = parse_xplane(trace_dir, steps, args.top)
    report["dtype"] = args.dtype
    print(json.dumps(report, indent=1))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
