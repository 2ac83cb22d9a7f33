#!/usr/bin/env python
"""bf16-vs-f32 numerics guard for the streaming 1080p inference path.

bench.py reports bf16 throughput; this script pins the numerics cost of
that choice: it streams the same synthetic 1080p clip through the
flagship model (vmn_fba, seeded random init) in f32 and bf16 and reports
the alpha deltas plus the dtSSD each dtype would score (the headline
temporal-coherence metric, reference calc_metric.py:31-34). Run on the
real chip; the JSON artifact (bf16_guard.json) is committed per round.

    python tools/validate_bf16.py [--frames 5] [--out bf16_guard.json]
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

import jax.numpy as jnp
import numpy as np

from tcvom_tpu.infer.predict import StreamingPredictor
from tcvom_tpu.models import full_model as FM
from tcvom_tpu.models import registry


def synth_clip(frames, h, w, seed=0):
    """Moving soft disc: non-trivial alpha gradients + temporal motion."""
    rng = np.random.RandomState(seed)
    bg = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(frames):
        cy, cx = h * 0.45 + 30 * i, w * 0.5 + 40 * i
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        alpha = np.clip((260.0 - d) / 120.0, 0, 1)
        img = alpha[..., None] * rng.randint(100, 200, 3) + \
            (1 - alpha[..., None]) * bg
        tri = np.where(alpha > 0.95, 255.0, np.where(alpha < 0.05, 0.0, 128.0))
        yield img[None].astype(np.float32), tri[None, ..., None].astype(np.float32), alpha


def stream(module, variables, cfg, clip, dtype):
    sp = StreamingPredictor(module, variables, cfg, dtype=dtype)
    state, outs = None, []
    for img, tri, _ in clip:
        state, out = sp.step(state, img, tri)
        if out is not None:
            outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
    out = sp.flush(state)
    outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
    return np.concatenate(outs, 0)          # [T, H, W, 1]


def dtssd(alphas, gts):
    """sqrt(mean((dA_pred - dA_gt)^2)) per frame pair, x100 like the
    reference (calc_metric.py:31-34)."""
    da = np.diff(alphas[..., 0], axis=0)
    dg = np.diff(gts, axis=0)
    return float(np.mean(np.sqrt(np.mean((da - dg) ** 2, axis=(1, 2)))) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--size", type=int, nargs=2, default=(1088, 1920))
    ap.add_argument("--model", default="vmn_fba",
                    choices=["vmn_fba", "vmn_dim", "vmn_gca", "vmn_index"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    h, w = args.size
    if args.out is None:
        suffix = "" if args.model == "vmn_fba" else f"_{args.model[4:]}"
        args.out = str(pathlib.Path(__file__).resolve().parents[1]
                       / f"bf16_guard{suffix}.json")

    name = args.model
    cfg = FM.TaskConfig(model=name, agg_window=7)
    module = registry.build_model(name, agg_window=7)
    x = jnp.zeros((1, 3, h, w, 3 + cfg.trimap_channels), jnp.float32)
    masks = jnp.ones((1, 3, h, w, 1), jnp.float32)
    extras = ((jnp.zeros((1, 3, h, w, 3)), jnp.zeros((1, 3, h, w, 2)))
              if cfg.method == "fba" else None)
    variables = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x, masks, extras=extras, train=False))()

    clip = list(synth_clip(args.frames, h, w))
    gts = np.stack([c[2] for c in clip])
    a32 = stream(module, variables, cfg, clip, None)
    a16 = stream(module, variables, cfg, clip, jnp.bfloat16)

    # tie-chaos CONTROL: f32 COMPUTE with params and inputs round-tripped
    # through bf16 once. A random-init hard attention (GCA) or saturated
    # tanh picks among near-tied candidates, so the ~0.4% relative rounding
    # of merely STORING features/weights in bf16 re-rolls a set of isolated
    # winners no matter how the network then computes (the f32-vs-f32
    # packed_vs_direct flips in tpu_selfcheck are the same phenomenon).
    # Flips the control also produces are inherent to the bf16
    # representation; the gate checks the bf16 compute path adds no more.
    q = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    clip_p = [(np.float32(jnp.asarray(img, jnp.bfloat16)), tri, a)
              for img, tri, a in clip]
    a32p = stream(module, q(variables), cfg, clip_p, None)

    # the streaming predictor pastes trimap values outside the unknown
    # region (EvalModel semantics, reference models/model.py:413-424), so
    # any f32/bf16 difference can only live inside it. Normalize the flip
    # fractions by the UNKNOWN area — whole-frame normalization overstated
    # the margin by the known/unknown ratio — and assert the pasted region
    # is bit-equal (a diff there means the pasting itself broke).
    unknown = np.stack([np.asarray(c[1][0, ..., 0]) == 128.0
                        for c in clip])[..., None]       # [T, H, W, 1]
    d = np.abs(a32 - a16)
    assert float(d[~unknown].max(initial=0.0)) == 0.0, \
        "f32/bf16 differ in the pasted (known) region"
    n_unk = max(int(unknown.sum()), 1)
    flip = (d > 0.5) & unknown
    transitional = (a32 > 0.05) & (a32 < 0.95) & unknown
    dc = np.abs(a32 - a32p)
    flip_ctrl = (dc > 0.5) & unknown
    ctrl_saturated = float((flip_ctrl & ~transitional).sum() / n_unk)
    ctrl_transitional = float((flip_ctrl & transitional).sum() / n_unk)
    soft_ctrl = dc[transitional]
    ctrl_p999_soft = (float(np.quantile(soft_ctrl, 0.999))
                      if soft_ctrl.size else 0.0)
    report = {
        "model": name, "frames": args.frames, "hw": [h, w],
        "unknown_frac": float(unknown.mean()),
        "mean_abs_dalpha": float(d.mean()),
        "max_abs_dalpha": float(d.max()),
        "p999_abs_dalpha": float(np.quantile(d[unknown], 0.999)),
        # locality metrics: a mean-only gate can hide a handful of pixels
        # flipping alpha completely. Flips split by the f32 pixel state:
        # - transitional (0.05<a32<0.95): bf16 pushed a genuinely soft
        #   pixel to an extreme -> real numerics damage, gated hard.
        # - saturated (a32 at 0/1): both dtypes sit at a pole and disagree
        #   on WHICH pole — an upstream hard-attention/tanh tie broke the
        #   other way. At random init the attention logits are unnormalized
        #   and softmax acts as argmax, so a 1-ulp reordering flips the
        #   winner (measured: GCA is bitwise-equal on 99.94% of pixels,
        #   p999 = 0, every diff a full flip). Trained weights keep logits
        #   moderate; gated loosely as a canary.
        "frac_flip": float(flip.sum() / n_unk),
        "frac_flip_transitional": float((flip & transitional).sum() / n_unk),
        "frac_dalpha_gt_0.25": float(((d > 0.25) & unknown).sum() / n_unk),
        "dtssd_f32": round(dtssd(a32, gts), 4),
        "dtssd_bf16": round(dtssd(a16, gts), 4),
    }
    report["frac_flip_saturated"] = report["frac_flip"] - \
        report["frac_flip_transitional"]
    # soft-pixel fidelity: the p99.9 delta over unknown pixels that are in
    # a genuinely soft f32 state — where a delta means gradient damage
    # rather than a tie re-roll
    soft = d[transitional]
    report["p999_soft"] = float(np.quantile(soft, 0.999)) if soft.size else 0.0
    report["ctrl"] = {"frac_flip_saturated": ctrl_saturated,
                      "frac_flip_transitional": ctrl_transitional,
                      "p999_soft": ctrl_p999_soft}
    report["dtssd_rel_delta"] = abs(
        report["dtssd_bf16"] - report["dtssd_f32"]) / max(
        report["dtssd_f32"], 1e-9)
    # gates (all statistics normalized by the UNKNOWN area, the only region
    # that survives EvalModel pasting):
    # (1) headline temporal metric moves <1% (BASELINE.md parity tolerance);
    # (2)-(4) locality stats, each gated at <=3x the STORAGE CONTROL (or an
    # absolute floor when the control is ~0). Whatever the control also
    # produces is the unavoidable cost of representing weights/features in
    # bf16 at all — e.g. GCA's random-init hard attention re-rolls argmax
    # ties among thousands of near-tied candidates under ANY ~0.4%-relative
    # rounding, and FBA's steep random-init head pushes a handful of soft
    # pixels to a pole. The gates therefore pin the bf16 COMPUTE path
    # (accumulation/fusion numerics) to add at most 3x over representation
    # cost; a genuine compute-path regression shows up orders of magnitude
    # above the control.
    sat_gate = max(1e-3, 3.0 * ctrl_saturated)
    tra_gate = max(1e-5, 3.0 * ctrl_transitional)
    soft_gate = max(0.1, 3.0 * ctrl_p999_soft)
    report["gate_values"] = {"saturated": sat_gate, "transitional": tra_gate,
                             "p999_soft": soft_gate}
    gates = {
        "dtssd_rel_delta<0.01": report["dtssd_rel_delta"] < 0.01,
        "frac_flip_transitional<max(1e-5,3*ctrl)":
            report["frac_flip_transitional"] < tra_gate,
        "frac_flip_saturated<max(1e-3,3*ctrl)":
            report["frac_flip_saturated"] < sat_gate,
        "p999_soft<max(0.1,3*ctrl)": report["p999_soft"] < soft_gate,
    }
    report["gates"] = {k: bool(v) for k, v in gates.items()}
    report["ok"] = all(gates.values())
    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
    assert report["ok"], report


if __name__ == "__main__":
    main()
