#!/usr/bin/env python
"""Per-backbone 1080p inference bench sweep -> one committed artifact.

Runs bench.py (same delta-timing harness, same streaming pipeline) for all
four VMN backbones in bf16 plus the flagship in f32, each in a fresh
process so compile caches and chip state don't leak between rows. The
README throughput table is refreshed from this artifact (VERDICT r03 #3:
no stale per-backbone numbers).

    python tools/bench_all.py [--out BENCH_ALL_r05.json]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

ROWS = [
    # (model, dtype, concurrent streams) — streams > 1 batches N
    # independent video streams through one chip (the serving
    # configuration): per-stream latency rises but launch-bound ops
    # amortize and MXU occupancy improves, so aggregate frames/sec/chip
    # is the number a deployment actually gets
    ("vmn_fba", "bf16", 1),
    ("vmn_gca", "bf16", 1),
    ("vmn_dim", "bf16", 1),
    ("vmn_index", "bf16", 1),
    ("vmn_fba", "f32", 1),
    ("vmn_fba", "bf16", 2),
    ("vmn_fba", "bf16", 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "BENCH_ALL_r05.json"))
    args = ap.parse_args()

    rows = []
    for model, dtype, streams in ROWS:
        env = dict(os.environ, BENCH_MODEL=model, BENCH_DTYPE=dtype,
                   BENCH_STREAMS=str(streams))
        try:
            r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                               env=env, capture_output=True, text=True,
                               timeout=1800)
            line = (r.stdout.strip().splitlines()[-1]
                    if r.stdout.strip() else "")
            try:
                data = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                data = {"error": (r.stderr or r.stdout)[-400:],
                        "returncode": r.returncode}
        except subprocess.TimeoutExpired:
            # record the hung row and keep sweeping — the incremental-write
            # guarantee below must hold for timeouts too
            data = {"error": "timeout", "returncode": None}
        rows.append({"model": model, "dtype": dtype, "streams": streams,
                     **data})
        print(json.dumps(rows[-1]))
        # write after every row so a cut-off sweep still leaves a valid
        # artifact with the rows that did finish
        artifact = {"harness": "bench.py delta-timing, device-resident "
                               "inputs, streaming pipeline "
                               "(1 encode + 1 decode/matte)",
                    "hw": [1088, 1920], "rows": rows}
        pathlib.Path(args.out).write_text(
            json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
