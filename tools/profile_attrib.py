#!/usr/bin/env python
"""Component-attributed TPU roofline of the streaming 1080p inference step
— or, with ``--train``, of the jitted training step (the reference hot
loop, train_ddp.py:52-84).

Captures a jax.profiler trace of the steady-state StreamingPredictor step
(encode + decode jit executables) or MattingTrainer.train_step, then
attributes every device-side XLA op back to its model component via the
op's ``tf_op`` path and ``source`` metadata (recorded by XLA in the
xplane trace), summing measured FLOPs and bytes-accessed to place each
component on the v5e roofline.

This answers "which resource saturates each component" with measured
numbers instead of estimates — the data behind PROFILE_r03.md.

Usage:
    python tools/profile_attrib.py [--dtype bf16] [--steps 10]
        [--out PROFILE_r05_attrib.json] [--trace_dir DIR]
    python tools/profile_attrib.py --train [--batch 1] [--s 5]
        [--hw 512 512] [--out PROFILE_TRAIN_r05_attrib.json]

(xplane_pb2 needs the pure-python protobuf implementation; the tool
re-execs itself with it set, like tools/profile_ops.py.)
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

# v5e single-chip peaks (public spec): 197 TFLOP/s bf16 (halve for f32
# via MXU passes), 819 GB/s HBM bandwidth.
PEAK_TFLOPS_BF16 = 197.0
PEAK_GBS = 819.0


def capture_trace(dtype_name: str, steps: int, trace_dir: str, model: str,
                  hw=(1088, 1920), streams: int = 1):
    from tcvom_tpu.infer.predict import StreamingPredictor
    from tcvom_tpu.models import full_model as FM
    from tcvom_tpu.models import registry

    cfg = FM.TaskConfig(model=model, agg_window=7)
    module = registry.build_model(model, agg_window=7)
    b, s, (h, w) = streams, 3, hw
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
    tri[:, int(.28 * h):int(.74 * h), int(.26 * w):int(.73 * w)] = 128.0
    tri[:, int(.41 * h):int(.60 * h), int(.36 * w):int(.63 * w)] = 255.0
    tri = jax.device_put(jnp.asarray(tri))

    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    sp = StreamingPredictor(module, variables, cfg, dtype=dtype,
                            fgbg=False, quantize=True)
    state, _ = sp.step(None, img, tri)
    state, _ = sp.step(state, img, tri)
    state, out = sp.step(state, img, tri)
    np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, out = sp.step(state, img, tri)
        np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return steps


def capture_train_trace(dtype_name: str, steps: int, trace_dir: str,
                        model: str, hw=(512, 512), batch: int = 1,
                        s: int = 5):
    """Trace the jitted video train step (driver 'vmd', full loss stack —
    the reference hot loop train_ddp.py:52-84) at the reference's training
    crop and batch."""
    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer

    h, w = hw
    trainer = MattingTrainer(TaskConfig(model=model, agg_window=7), "vmd",
                             lr_strategy="poly", base_lr=1e-4,
                             total_iters=100_000,
                             compute_dtype=jnp.bfloat16
                             if dtype_name == "bf16" else None)
    rng = np.random.RandomState(0)
    a = np.zeros((batch, s, h, w, 1), np.float32)
    a[:, :, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = \
        rng.rand(batch, s, h // 2, w // 2, 1) * 255.0
    batch_d = {"a": jnp.asarray(a),
               "fg": jnp.asarray(rng.randint(0, 256, (batch, s, h, w, 3)),
                                 jnp.float32),
               "bg": jnp.asarray(rng.randint(0, 256, (batch, s, h, w, 3)),
                                 jnp.float32)}
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, batch_d)
    state, m = trainer.train_step(state, batch_d, key)     # compile + warm
    np.asarray(m["loss"])
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, m = trainer.train_step(state, batch_d, key)
        np.asarray(m["loss"])
    return steps


# ---------------------------------------------------------------------------
# component bucketing from the tf_op path
# ---------------------------------------------------------------------------

_ENC_LAYER = re.compile(r"encoder/(layer\d+)_")
_DEC_PART = re.compile(r"decoder/(ppm|up1_\d|up2|up3|up4)")


def bucket_of(tf_op: str, source: str) -> str:
    """Map an op's tf_op path + source file to a model component bucket."""
    exe = "encode" if "_encode_impl" in tf_op else (
        "decode" if "_decode_impl" in tf_op else (
            "train" if ("train_step" in tf_op or "loss_fn" in tf_op)
            else "other"))
    m = _ENC_LAYER.search(tf_op)
    if m:
        return f"{exe}:encoder.{m.group(1)}"
    if "encoder/" in tf_op:
        return f"{exe}:encoder.stem"
    if "/fam/" in tf_op or "fam_" in source:
        return f"{exe}:fam"
    m = _DEC_PART.search(tf_op)
    if m:
        part = m.group(1)
        if part.startswith("up1"):
            part = "up1"
        return f"{exe}:decoder.{part}"
    if "decoder/" in tf_op:
        return f"{exe}:decoder.tail"
    if "distance" in source:
        return f"{exe}:preprocess.edt"
    if "full_model" in source or "image.py" in source:
        return f"{exe}:preprocess"
    if "subpixel" in source or "fba.py" in source:
        return f"{exe}:decoder.tail"
    return f"{exe}:misc"


def parse_xplane(trace_dir: str, steps: int, dtype_name: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(pathlib.Path(trace_dir).rglob("*.xplane.pb"),
                 key=lambda p: p.stat().st_mtime)
    assert pbs, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    plane = next(p for p in space.planes if p.name == "/device:TPU:0")
    sm = {i: m.name for i, m in plane.stat_metadata.items()}

    def md_stats(md):
        out = {}
        for st in md.stats:
            name = sm.get(st.metadata_id, "")
            out[name] = (st.uint64_value or st.int64_value or
                         st.double_value or st.str_value or "")
        return out

    line = next(l for l in plane.lines if l.name == "XLA Ops")
    per_op = collections.defaultdict(lambda: [0.0, 0])      # id -> [ps, n]
    for ev in line.events:
        a = per_op[ev.metadata_id]
        a[0] += ev.duration_ps
        a[1] += 1

    buckets = collections.defaultdict(
        lambda: {"ms": 0.0, "flops": 0.0, "bytes": 0.0, "n_ops": 0})
    ops = []
    for mid, (ps, n) in per_op.items():
        md = plane.event_metadata[mid]
        stats = md_stats(md)
        tf_op = str(stats.get("tf_op", ""))
        source = str(stats.get("source", ""))
        flops = float(stats.get("flops", 0) or 0) * n
        nbytes = float(stats.get("bytes_accessed", 0) or 0) * n
        b = bucket_of(tf_op, source)
        agg = buckets[b]
        agg["ms"] += ps / 1e9
        agg["flops"] += flops
        agg["bytes"] += nbytes
        agg["n_ops"] += 1
        ops.append({"op": (md.display_name or md.name), "bucket": b,
                    "ms": ps / 1e9, "flops": flops, "bytes": nbytes,
                    "tf_op": tf_op[:120], "source": source,
                    "shape": str(stats.get("shape_with_layout", ""))[:80]})

    peak_tf = PEAK_TFLOPS_BF16 if dtype_name == "bf16" else PEAK_TFLOPS_BF16 / 2

    def roofline(ms, flops, nbytes):
        t = ms / 1e3 / steps
        if t <= 0:
            return {}
        tfs = flops / steps / t / 1e12
        gbs = nbytes / steps / t / 1e9
        mfu = tfs / peak_tf
        hbm = gbs / PEAK_GBS
        bound = "MXU" if mfu >= hbm else "HBM"
        return {"tflops_per_s": round(tfs, 1), "gb_per_s": round(gbs, 0),
                "pct_mxu_peak": round(100 * mfu, 1),
                "pct_hbm_peak": round(100 * hbm, 1), "bound": bound}

    total_ms = sum(b["ms"] for b in buckets.values())
    rows = []
    for name, b in sorted(buckets.items(), key=lambda kv: -kv[1]["ms"]):
        rows.append({"component": name,
                     "ms_per_step": round(b["ms"] / steps, 3),
                     "pct": round(100 * b["ms"] / total_ms, 1),
                     "n_ops": b["n_ops"],
                     **roofline(b["ms"], b["flops"], b["bytes"])})

    ops.sort(key=lambda o: -o["ms"])
    top_ops = [{"op": o["op"], "bucket": o["bucket"],
                "ms_per_step": round(o["ms"] / steps, 3),
                **roofline(o["ms"], o["flops"], o["bytes"]),
                "source": o["source"], "shape": o["shape"]}
               for o in ops[:40]]

    # per-source-line aggregation inside each bucket: the long tail of
    # launch-bound small ops (border strips, scatters) never makes top_ops
    # individually but dominates some buckets collectively
    src = collections.defaultdict(lambda: [0.0, 0])
    for o in ops:
        key = (o["bucket"], o["source"] or o["op"].split(".")[0])
        src[key][0] += o["ms"]
        src[key][1] += 1
    top_sources = [
        {"bucket": b, "source": s, "ms_per_step": round(ms / steps, 3),
         "n_ops": n}
        for (b, s), (ms, n) in sorted(src.items(), key=lambda kv: -kv[1][0])
        [:40]]

    return {"steps": steps, "dtype": dtype_name,
            "device_total_ms_per_step": round(total_ms / steps, 3),
            "peak_tflops": peak_tf, "peak_gbs": PEAK_GBS,
            "components": rows, "top_ops": top_ops,
            "top_sources": top_sources}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--model", default="vmn_fba")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(1088, 1920),
                    help="frame size (small values smoke-test on CPU)")
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent video streams (batch) per step")
    ap.add_argument("--train", action="store_true",
                    help="profile the jitted video train step instead of "
                         "the streaming inference step")
    ap.add_argument("--batch", type=int, default=1,
                    help="train-mode batch (reference BATCH_SIZE_PER_GPU)")
    ap.add_argument("--s", type=int, default=5,
                    help="train-mode temporal window")
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--parse_only", action="store_true",
                    help="skip capture; parse an existing --trace_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="tpu_attrib_")
    if not args.parse_only:
        if args.train:
            hw = tuple(args.hw) if tuple(args.hw) != (1088, 1920) \
                else (512, 512)
            capture_train_trace(args.dtype, args.steps, trace_dir,
                                args.model, hw=hw, batch=args.batch,
                                s=args.s)
        else:
            capture_trace(args.dtype, args.steps, trace_dir, args.model,
                          hw=tuple(args.hw), streams=args.streams)
    report = parse_xplane(trace_dir, args.steps, args.dtype)
    report["model"] = args.model
    report["mode"] = "train" if args.train else "stream"
    print(json.dumps(report, indent=1))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
