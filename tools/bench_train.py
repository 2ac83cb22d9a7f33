#!/usr/bin/env python
"""On-TPU train-step benchmark — ms/step + achieved TFLOP/s for the
reference training configurations; writes a committed per-round artifact
(default BENCH_TRAIN_r05.json).

Configs (reference cfgs/, 4-GPU DDP in the reference, one chip here):
- vmn_fba  video trainer, b=1, 512x512, S=5, full L_im+L_tc+L_af stack
  (cfgs/vmd_vmn_fba_pretrained_30ep.yaml; reference train_ddp.py)
- vmn_dim  video trainer, b=4, 512x512, S=5
  (cfgs/vmd_vmn_dim_pretrained_30ep.yaml)

Extra datapoints per config: --remat (encoder rematerialization) and the
production bf16 mixed-precision recipe (TRAIN.BF16 /
``MattingTrainer(compute_dtype=bfloat16)``: f32 master weights/optimizer/
EMA, bf16 params+activations inside the step; numerics guard
tools/validate_bf16_train.py -> BF16_TRAIN_GUARD.json).

FLOPs come from XLA's own cost analysis of the compiled train step, so
achieved TFLOP/s = cost_analysis flops / measured step time is honest
about whatever fusion/remat the compiler actually did.

Delta timing (run N then 2N, diff) cancels the dispatch+readback RTT of
the device tunnel — see tools/bench_fam.py::time_fn.

Usage:
    python tools/bench_train.py [--out BENCH_TRAIN_r05.json] [--iters 10]
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

CONFIGS = [
    # (model, driver, batch, s, hw, label) — batch per chip equals the
    # reference's BATCH_SIZE_PER_GPU (cfgs/vmd_vmn_*_pretrained_30ep.yaml)
    ("vmn_fba", "vmd", 1, 5, (512, 512), "FBA+TAM video b=1 512^2 S=5"),
    ("vmn_dim", "vmd", 4, 5, (512, 512), "DIM+TAM video b=4 512^2 S=5"),
    ("vmn_gca", "vmd", 6, 5, (512, 512), "GCA+TAM video b=6 512^2 S=5"),
    ("vmn_index", "vmd", 4, 5, (512, 512), "Index+TAM video b=4 512^2 S=5"),
]


def make_batch(rng, b, s, h, w, dtype=jnp.float32):
    a = np.zeros((b, s, h, w, 1), np.float32)
    a[:, :, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = \
        rng.rand(b, s, h // 2, w // 2, 1) * 255.0
    return {"a": jnp.asarray(a, dtype),
            "fg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)), dtype),
            "bg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)), dtype)}


def bench_one(model, driver, b, s, hw, remat, iters, bf16=False):
    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer

    h, w = hw
    # bf16 rows measure the PRODUCTION mixed-precision recipe (TRAIN.BF16:
    # f32 master weights/optimizer/EMA, bf16 params+activations inside the
    # step; numerics guard tools/validate_bf16_train.py)
    trainer = MattingTrainer(TaskConfig(model=model, agg_window=7), driver,
                             lr_strategy="poly", base_lr=1e-4,
                             total_iters=100_000, remat=remat,
                             compute_dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, b, s, h, w)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, batch)

    # jit the step through the trainer's own path; pull XLA's FLOP count
    # from the compiled executable
    compiled = type(trainer).train_step.lower(
        trainer, state, batch, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):            # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) if ca else 0.0

    def readback(metrics):
        return float(np.asarray(metrics["loss"]))

    state, metrics = trainer.train_step(state, batch, key)
    readback(metrics)

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = trainer.train_step(state, batch, key)
        readback(m)
        return time.perf_counter() - t0

    t1, t2 = run(iters), run(2 * iters)
    ms = (t2 - t1) / iters * 1e3
    return {"ms_per_step": round(ms, 2),
            "xla_flops_per_step": flops,
            "achieved_tflops": round(flops / (ms * 1e-3) / 1e12, 2)
            if flops else None,
            "loss_finite": bool(np.isfinite(readback(metrics)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[1] / "BENCH_TRAIN_r05.json"))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip_remat", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, correctness-of-harness only")
    args = ap.parse_args()

    configs = CONFIGS if not args.smoke else [
        ("vmn_dim", "vmd", 1, 3, (64, 64), "smoke")]
    results = []
    for model, driver, b, s, hw, label in configs:
        # every backbone gets f32 + bf16 (the 4 x {f32, bf16} train
        # matrix); the remat datapoint only for the flagship
        variants = [(False, False)]
        if model == "vmn_fba" and not args.skip_remat:
            variants.append((False, True))
        variants.append((True, False))       # bf16-compute probe
        for bf16, remat in variants:
            row = {"model": model, "driver": driver, "batch": b, "s": s,
                   "hw": list(hw), "remat": remat, "bf16": bf16,
                   "label": label}
            try:
                row.update(bench_one(model, driver, b, s, hw, remat,
                                     args.iters, bf16=bf16))
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"[:300]
            results.append(row)
            print(json.dumps(row))

    artifact = {"backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "jax_version": jax.__version__, "results": results}
    pathlib.Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
