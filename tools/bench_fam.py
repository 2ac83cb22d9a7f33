#!/usr/bin/env python
"""On-TPU FAM kernel regression benchmark.

Times the three implementations of the TAM/FAM window attention (the hot
op of the flagship model; reference models/VMN/VMN_model.py:18-68) at
representative grids, asserts fused-vs-XLA numerics, and dumps one JSON
artifact (default: bench_fam.json at the repo root). Run once per round on
the real chip so Mosaic/JAX regressions surface:

    python tools/bench_fam.py [--out bench_fam.json] [--iters 30]

Grids: 64x64 is the 512^2 training crop at OS=8; 136x240 is the 1088x1920
inference frame at OS=8 (the bench.py path). C=256 covers DIM/FBA, C=128
covers GCA; Index (C=32) always takes the XLA path (lane alignment).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from tcvom_tpu.ops.fam import fam_attention as fam_xla
from tcvom_tpu.ops import fam_pallas

CASES = [
    # (h, w, c, window, label)
    (64, 64, 256, 7, "train-crop OS=8, C=256 (dim/fba)"),
    (136, 240, 256, 7, "1080p OS=8, C=256 (dim/fba)"),
    (136, 240, 128, 7, "1080p OS=8, C=128 (gca)"),
]


def _mask(h, w):
    m = np.zeros((1, h, w, 1), np.float32)
    m[:, h // 4: 3 * h // 4, w // 6: 5 * w // 6] = 1.0
    return m


def _readback(out):
    """Force a real device sync: a scalar host readback. Through the axon
    device tunnel ``block_until_ready`` returns before execution finishes,
    so enqueue-only timing under-reports small kernels by orders of
    magnitude; only a data dependency reaching the host is a true fence."""
    return np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def time_fn(fn, *args, iters=30):
    """Delta timing: T(2N) - T(N) cancels the constant dispatch+readback
    RTT (~30ms through the tunnel), leaving pure per-iteration device time.
    Validated against a 4096^3 bf16 matmul: 180 TFLOP/s on v5e (~91% of
    peak), so the harness measures real device throughput."""
    out = fn(*args)
    _readback(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    t1, t2 = run(iters), run(2 * iters)
    return (t2 - t1) / iters * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[1] / "bench_fam.json"))
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    results = []
    for h, w, c, window, label in CASES:
        rng = np.random.RandomState(0)
        for dtype_name in ("float32", "bfloat16"):
            dtype = jnp.dtype(dtype_name)
            q = jnp.asarray(rng.randn(1, h, w, c), dtype)
            k = jnp.asarray(rng.randn(1, h, w, c), dtype)
            m = jnp.asarray(_mask(h, w), dtype)

            xla = jax.jit(lambda q, k, m: fam_xla(q, k, m, window))
            vpu = jax.jit(lambda q, k, m: fam_pallas._fam_pallas_fwd(
                q, k, m, window, mxu=False))
            mxu = jax.jit(lambda q, k, m: fam_pallas._fam_pallas_fwd(
                q, k, m, window, mxu=True))

            t_xla, (o_ref, l_ref) = time_fn(xla, q, k, m, iters=args.iters)
            row = {"grid": f"{h}x{w}", "c": c, "window": window,
                   "dtype": dtype_name, "label": label,
                   "xla_ms": round(t_xla, 3)}
            for name, fn in (("vpu", vpu), ("mxu", mxu)):
                try:
                    t, (o, lg) = time_fn(fn, q, k, m, iters=args.iters)
                    do = float(jnp.max(jnp.abs(
                        o.astype(jnp.float32) - o_ref.astype(jnp.float32))))
                    dl = float(jnp.max(jnp.abs(
                        lg.astype(jnp.float32) - l_ref.astype(jnp.float32))))
                    row[f"{name}_ms"] = round(t, 3)
                    row[f"{name}_maxerr_out"] = do
                    row[f"{name}_maxerr_logits"] = dl
                    # numerics guard: fused must match XLA to dtype precision
                    tol = 5e-5 if dtype_name == "float32" else 1e-1
                    row[f"{name}_ok"] = bool(do < tol and dl < tol * 200)
                except Exception as e:  # lowering/compile failure = regression
                    row[f"{name}_ms"] = None
                    row[f"{name}_ok"] = False
                    row[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            results.append(row)
            print(json.dumps(row))

    # narrow-channel (Index C=32) padded path: XLA at the true width vs
    # the dispatcher's zero-pad-to-128 fused inference path (no logits)
    for h, w in ((136, 240), (64, 64)):
        for dtype_name in ("bfloat16", "float32"):
            dtype = jnp.dtype(dtype_name)
            rng = np.random.RandomState(0)
            q = jnp.asarray(rng.randn(1, h, w, 32), dtype)
            k = jnp.asarray(rng.randn(1, h, w, 32), dtype)
            m = jnp.asarray(_mask(h, w), dtype)
            xla = jax.jit(lambda q, k, m: fam_xla(q, k, m, 7))
            pad = jax.jit(lambda q, k, m: fam_pallas.fam_attention(
                q, k, m, 7, use_pallas=True, need_logits=False))
            row = {"grid": f"{h}x{w}", "c": 32, "window": 7,
                   "dtype": dtype_name, "label": "c32_pad (index)"}
            try:
                t_xla, (o_ref, _) = time_fn(xla, q, k, m, iters=args.iters)
                t_pad, (o, _) = time_fn(pad, q, k, m, iters=args.iters)
                do = float(jnp.max(jnp.abs(
                    o.astype(jnp.float32) - o_ref.astype(jnp.float32))))
                tol = 5e-5 if dtype_name == "float32" else 1e-1
                row.update(xla_ms=round(t_xla, 3), pad_ms=round(t_pad, 3),
                           pad_maxerr_out=do, pad_ok=bool(do < tol))
            except Exception as e:
                row.update(pad_ms=None, pad_ok=False,
                           pad_error=f"{type(e).__name__}: {e}"[:300])
            results.append(row)
            print(json.dumps(row))

    artifact = {"backend": backend, "device": dev,
                "jax_version": jax.__version__, "results": results}
    pathlib.Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {args.out}")
    def expected_ok(r, name):
        # the VPU variant is known not to lower in bf16 (sublane-8 roll
        # tiles under bf16's 16-sublane minimum) — not a regression
        if name == "vpu" and r["dtype"] == "bfloat16":
            return True
        return bool(r.get(f"{name}_ok"))

    bad = [r for r in results if r["c"] != 32
           and not (expected_ok(r, "vpu") and expected_ok(r, "mxu"))]
    bad += [r for r in results if r["c"] == 32 and not r.get("pad_ok")]
    if backend == "tpu" and bad:
        print(f"FAIL: {len(bad)} rows with numerics/lowering failures")
        sys.exit(1)
    print("all supported variants within tolerance")


if __name__ == "__main__":
    main()
