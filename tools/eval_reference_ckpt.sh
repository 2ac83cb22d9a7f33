#!/usr/bin/env bash
# Published-metric validation: run a released TCVOM checkpoint through this
# framework's full inference + metric chain and diff against the reference
# README's table (BASELINE.md; primary target FBA+TAM dtSSD 25.50).
#
# Requirements this environment does NOT have (zero egress, no datasets):
#   1. VideoMatting108 (download per the reference README, ~100GB) laid out
#      as  <DATA>/{FG_done,BG_done,flow_png_val,frame_corr.json,
#                  train_videos{,_subset}.txt,val_videos{,_subset}.txt}
#   2. A released checkpoint, e.g. FBA_TAM_Lim_Ltc_Laf.pth (the converter
#      in tcvom_tpu/utils/convert.py handles the torch .pth directly).
#
# Usage:
#   tools/eval_reference_ckpt.sh <DATA> <CKPT.pth> [model] [trimap] [outdir]
#   tools/eval_reference_ckpt.sh /data/VM108 FBA_TAM_Lim_Ltc_Laf.pth fba medium
#
# The script writes <outdir>/metric.json and prints a comparison against
# the published numbers, flagging any metric off by >1% (the BASELINE.md
# parity bar).
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${1:?VideoMatting108 root}
CKPT=${2:?reference checkpoint (.pth)}
MODEL=${3:-fba}
TRIMAP=${4:-medium}
OUT=${5:-results/published/${MODEL}_${TRIMAP}}

python tools/pred_vmn.py --model "$MODEL" --data "$DATA" --load "$CKPT" \
    --trimap "$TRIMAP" --save "$OUT" --agg_window 7
python tools/calc_metric.py --pred "$OUT" --data "$DATA" --n_threads 16

python - "$OUT/metric.json" "$MODEL" <<'EOF'
import json, sys
# published VideoMatting108 val numbers, medium trimap (BASELINE.md /
# reference README.md:75-82), TAM rows
PUBLISHED = {
    "gca":   {"SSDA": 50.41, "dtSSD": 27.28, "MESSDdt": 1.48, "mSAD": 37.65},
    "dim":   {"SSDA": 58.94, "dtSSD": 29.89, "MESSDdt": 2.06, "mSAD": 43.28},
    "index": {"SSDA": 57.91, "dtSSD": 29.36, "MESSDdt": 1.81, "mSAD": 43.17},
    "fba":   {"SSDA": 51.57, "dtSSD": 25.50, "MESSDdt": 1.59, "mSAD": 37.24},
}
path, model = sys.argv[1], sys.argv[2]
got = json.load(open(path))["avg"]
want = PUBLISHED[model]
print(f"\n{'metric':>10} {'published':>10} {'this repo':>10} {'rel delta':>10}")
bad = []
for k, w in want.items():
    g = got[k]
    rel = abs(g - w) / w
    flag = "  <-- off by >1%" if rel > 0.01 else ""
    if rel > 0.01:
        bad.append(k)
    print(f"{k:>10} {w:>10.2f} {g:>10.2f} {rel:>9.2%}{flag}")
sys.exit(1 if bad else 0)
EOF
