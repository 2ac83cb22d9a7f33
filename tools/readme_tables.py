#!/usr/bin/env python
"""Render the README's perf tables from the committed round artifacts.

Every number in README.md's throughput and training tables must equal a
committed artifact produced by the shipped code (VERDICT r04 #1). This
tool makes that mechanical: it prints the markdown rows straight from
BENCH_ALL_r05.json / BENCH_TRAIN_r05.json / HOSTFEED_r05.json, so a
README refresh is copy-paste (or a diff check in review).

    python tools/readme_tables.py
"""
from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]

LABELS = {
    ("vmn_fba", "bf16"): "FBA+TAM bf16 (bench default; numerics guard in"
                         " `bf16_guard.json`)",
    ("vmn_fba", "f32"): "FBA+TAM f32 (`BENCH_DTYPE=f32`, reference"
                        " numerics)",
    ("vmn_gca", "bf16"): "GCA+TAM bf16 (`BENCH_MODEL=vmn_gca`, incl."
                         " global guided attention)",
    ("vmn_dim", "bf16"): "DIM+TAM bf16 (`BENCH_MODEL=vmn_dim`)",
    ("vmn_index", "bf16"): "Index+TAM bf16 (`BENCH_MODEL=vmn_index`)",
}


def throughput_table():
    art = json.loads((REPO / "BENCH_ALL_r05.json").read_text())
    print("| configuration | frames/sec/chip |")
    print("|---|---|")
    for r in art["rows"]:
        if "error" in r:
            print(f"| {r['model']} {r['dtype']} | ERROR: {r['error'][:60]} |")
            continue
        label = LABELS.get((r["model"], r["dtype"]), f"{r['model']} {r['dtype']}")
        if r.get("streams", 1) > 1:
            label = (f"FBA+TAM bf16, {r['streams']} concurrent streams "
                     f"(`BENCH_STREAMS={r['streams']}`, aggregate)")
        print(f"| {label} | {r['value']:.1f} |")


def train_table():
    art = json.loads((REPO / "BENCH_TRAIN_r05.json").read_text())
    print()
    print("| config | ms/step | XLA TFLOP/step | achieved TFLOP/s |")
    print("|---|---:|---:|---:|")
    for r in art["results"]:
        tag = r["label"].split(" video")[0].split(" b=")[0]
        mods = ("" if not r["remat"] else " `--remat`") + \
               ("" if not r["bf16"] else " bf16")
        name = f"{tag} b={r['batch']}{mods}"
        if "error" in r:
            print(f"| {name} | ERROR: {r['error'][:60]} | | |")
            continue
        fl = r["xla_flops_per_step"]
        print(f"| {name} | {r['ms_per_step']:.0f} | "
              f"{fl / 1e12:.2f} | {r['achieved_tflops']:.1f} |")


def hostfeed_line():
    p = REPO / "HOSTFEED_r05.json"
    if not p.exists():
        return
    art = json.loads(p.read_text())
    print()
    print(f"host-feed e2e: {art.get('e2e_fps', '?')} fps "
          f"({art.get('e2e_ms_per_frame', '?')} ms/frame); "
          f"decode {art.get('decode_ms_rgb')} / encode "
          f"{art.get('encode_ms_alpha')} ms standalone; phase breakdown "
          f"ms/frame: {art.get('phase_ms_per_frame')}")


if __name__ == "__main__":
    throughput_table()
    train_table()
    hostfeed_line()
