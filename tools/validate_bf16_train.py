#!/usr/bin/env python
"""bf16-compute TRAINING numerics guard — the train-side counterpart of
tools/validate_bf16.py (which gates inference only).

Two measurements over N steps of the flagship video config (FBA+TAM,
reference train loop train_ddp.py:52-84):

1. Per-step gradient fidelity: at every state along the **f32**
   trajectory, compute the loss gradients twice — f32, and through the
   production bf16 recipe (``MattingTrainer(compute_dtype=bf16)``: f32
   master weights, bf16 params/activations inside the step) — and record
   their cosine similarity and the relative loss error. This isolates
   what bf16 arithmetic does to a single step, without trajectory
   divergence compounding.
2. Trajectory tracking: run the full production bf16 trajectory
   (TRAIN.BF16) from the same init and record the per-step loss ratio vs
   the f32 trajectory.

Gates (pinned from the r04 measurement on v5e, see BF16_TRAIN_GUARD
artifact; re-derive if the model changes):
- min UPDATE cosine >= 0.90 after a 5-step warmup (the Adam steps point
  the same way once the moments exist — see the GATES comment for why
  raw-grad cosine is the wrong metric here and why step 0 is excluded)
- max |loss_rel|   <= 2e-2   (single-step bf16 loss error)
- max |traj_ratio - 1| <= 0.25 over the first N steps (trajectories track;
  loose by design — compounding drift is chaotic, not directional)

STATUS (r05): the guard FAILS on the update-cosine gate (dips to ~0.75 at
steps 5-7 before settling at ~0.95) and the recipe is therefore labeled
EXPERIMENTAL, off by default. Root cause, established by experiment: the
encoder's WS-conv weight gradients decohere under bf16 (per-group raw
cosines 0.002-0.05 vs f32) because the WS projection cancels the dominant
per-filter mean/scale components of dW, leaving rounding-scale noise as
the signal. A custom VJP that kept the weight cotangent in f32 through
the projection (f32-operand dW conv at DEFAULT precision — same single
bf16 MXU pass) measured IDENTICAL decoherence (cosine 0.846 vs 0.846 on
a controlled synthetic with a 20x cancellation ratio): the noise enters
through the bf16-rounded dW-conv INPUTS (activations and upstream
cotangents), not the cotangent materialization. Fixing it would require
f32 activations on the backward path, which is the f32 trainer. The
trajectory still tracks (loss_rel <=1.5%, traj dev <=6% over 20 steps)
because the decohered component lies mostly in WS-invariant directions
(the forward is exactly invariant to per-filter kernel mean/scale), but
the committed gate is the honest bar and it does not pass.

Usage:
    python tools/validate_bf16_train.py [--steps 20] [--out BF16_TRAIN_GUARD.json]
    python tools/validate_bf16_train.py --smoke     # tiny shapes, CI tier
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import functools

import jax.numpy as jnp
import numpy as np

# The gated fidelity is the OPTIMIZER UPDATE direction, not the raw grad:
# Adam normalizes per-coordinate, and the raw-gradient cosine is dominated
# by large noisy coordinates (weight-standardized convs subtract the
# per-filter mean, so their raw dW carries a big cancellation term bf16
# rounds chaotically — while contributing nothing to the WS-invariant
# update). Raw cosine is still reported, with a per-module breakdown.
GATES = {"min_update_cosine": 0.90, "max_loss_rel": 2e-2,
         "max_traj_ratio_dev": 0.25, "update_cosine_warmup": 5}
# The update-cosine gate applies AFTER a warmup window: at step 0 Adam's
# moments are zero, so the update is ~sign(g) per coordinate and every
# coordinate whose |g| sits below bf16 rounding noise flips sign randomly
# (measured on v5e: step-0 update cosine 0.21 -> 0.92 by step 3 -> ~0.96
# steady state). Early-step fidelity is still gated — by the loss-rel and
# trajectory-ratio gates, which is what actually matters before the
# moments exist. The full per-step history ships in the artifact.


def make_batch(rng, b, s, h, w):
    a = np.zeros((b, s, h, w, 1), np.float32)
    a[:, :, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = \
        rng.rand(b, s, h // 2, w // 2, 1) * 255.0
    return {"a": jnp.asarray(a),
            "fg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)),
                              jnp.float32),
            "bg": jnp.asarray(rng.randint(0, 256, (b, s, h, w, 3)),
                              jnp.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model", default="vmn_fba")
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 128))
    ap.add_argument("--s", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="64x64, 5 steps — harness correctness only")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[1]
        / "BF16_TRAIN_GUARD.json"))
    args = ap.parse_args()
    if args.smoke:
        args.hw, args.steps = (64, 64), 5

    from tcvom_tpu.models.full_model import TaskConfig
    from tcvom_tpu.train.trainer import MattingTrainer

    h, w = args.hw
    # the PRODUCTION bf16 recipe (MattingTrainer compute_dtype: f32 master
    # weights/optimizer/EMA, bf16 params+activations inside the step) vs
    # the plain f32 trainer — identical init (same key, same module)
    mk = lambda cd: MattingTrainer(TaskConfig(model=args.model, agg_window=7),
                                   "vmd", lr_strategy="poly", base_lr=1e-4,
                                   total_iters=100_000, compute_dtype=cd)
    trainer, trainer16 = mk(None), mk(jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, 1, args.s, h, w)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, batch)
    state16 = trainer16.init_state(key, batch)   # same init; builds its tx

    def loss_and_grads(tr):
        def lg(params, model_state, batch_):
            def loss_fn(p):
                variables = {"params": tr._cast_compute(p),
                             **tr._cast_compute(model_state)}
                losses, _, _ = tr._forward(
                    tr.module, variables, key, tr._cast_compute(batch_),
                    tr.cfg, train=True,
                    mutable=list(model_state.keys()) or False)
                return sum(tr.loss_weights[k] * v
                           for k, v in losses.items())
            return jax.value_and_grad(loss_fn)(params)
        return jax.jit(lg)

    lg32, lg16 = loss_and_grads(trainer), loss_and_grads(trainer16)

    def cosine(ga, gb):
        fa = jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                              for x in jax.tree.leaves(ga)])
        fb = jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                              for x in jax.tree.leaves(gb)])
        return jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb))

    cos_j = jax.jit(cosine)

    def group_cosines(ga, gb):
        """Cosine per second-level param group (encoder/decoder submodule)
        — localizes which module's gradients decohere under bf16."""
        out = {}
        for k in ga:
            sub_a, sub_b = ga[k], gb[k]
            if isinstance(sub_a, dict):
                for k2 in sub_a:
                    out[f"{k}/{k2}"] = round(float(
                        cos_j(sub_a[k2], sub_b[k2])), 4)
            else:
                out[k] = round(float(cos_j(sub_a, sub_b)), 4)
        return out

    def update_cosine(tr, st, g32, g16):
        """Cosine of the actual optimizer steps the two gradient sets
        produce — the quantity that moves the weights. Adam normalizes
        per-coordinate, so raw-grad cosine over-weights large noisy
        coordinates (WS-conv mean/std cancellation); the update direction
        is the fidelity that matters for the trajectory."""
        u32, _ = tr.tx.update(g32, st.opt_state, st.params)
        u16, _ = tr.tx.update(
            jax.tree.map(lambda a: a.astype(jnp.float32), g16),
            st.opt_state, st.params)
        return float(cos_j(u32, u16))

    # -- pass 1: grad fidelity along the f32 trajectory ----------------------
    # both gradients taken at the SAME f32 master state: isolates what the
    # bf16 compute path does to one step, no trajectory divergence mixed in
    cos_hist, ucos_hist, loss_rel_hist, f32_losses = [], [], [], []
    gcos_first = None
    st = state
    for i in range(args.steps):
        lf, gf = lg32(st.params, st.model_state, batch)
        lb, gb = lg16(st.params, st.model_state, batch)
        cos_hist.append(float(cos_j(gf, gb)))
        ucos_hist.append(update_cosine(trainer, st, gf, gb))
        if gcos_first is None:
            gcos_first = group_cosines(gf, gb)
        lf_, lb_ = float(lf), float(lb)
        loss_rel_hist.append(abs(lb_ - lf_) / max(abs(lf_), 1e-8))
        f32_losses.append(lf_)
        st, _ = trainer.train_step(st, batch, key)

    # -- pass 2: full production-recipe bf16 trajectory from the same init ---
    stb = state16
    traj_ratio = []
    for i in range(args.steps):
        stb, m = trainer16.train_step(stb, batch, key)
        traj_ratio.append(float(np.asarray(m["loss"])) /
                          max(abs(f32_losses[min(i, len(f32_losses) - 1)]),
                              1e-8))

    warm = min(GATES["update_cosine_warmup"], max(len(ucos_hist) - 1, 0))
    stats = {
        "min_update_cosine": min(ucos_hist[warm:]),
        "min_update_cosine_all": min(ucos_hist),
        "min_grad_cosine": min(cos_hist),
        "max_loss_rel": max(loss_rel_hist),
        "max_traj_ratio_dev": max(abs(r - 1.0) for r in traj_ratio),
        "update_cosine": [round(c, 6) for c in ucos_hist],
        "grad_cosine": [round(c, 6) for c in cos_hist],
        "grad_cosine_by_group_step0": gcos_first,
        "loss_rel": [round(x, 6) for x in loss_rel_hist],
        "traj_ratio": [round(x, 6) for x in traj_ratio],
        "f32_losses": [round(x, 4) for x in f32_losses],
    }
    ok = (stats["min_update_cosine"] >= GATES["min_update_cosine"]
          and stats["max_loss_rel"] <= GATES["max_loss_rel"]
          and stats["max_traj_ratio_dev"] <= GATES["max_traj_ratio_dev"])
    artifact = {"backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "model": args.model, "hw": list(args.hw), "s": args.s,
                "steps": args.steps, "gates": GATES, "all_ok": bool(ok),
                **stats}
    pathlib.Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps({k: artifact[k] for k in
                      ("all_ok", "min_update_cosine", "min_grad_cosine",
                       "max_loss_rel", "max_traj_ratio_dev")}))
    print(f"wrote {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
