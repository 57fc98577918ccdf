"""Summarize a jax.profiler trace (trace.json.gz) into a top-ops table.

The TensorBoard profile plugin's trace viewer JSON has one complete event
("ph": "X") per op execution with "dur" in microseconds and the op name in
"name". We aggregate device-lane events by a normalized op-family key so the
per-step time decomposes into ~20 readable rows.

Usage: python benchmarks/trace_top.py logs/profile [--steps N] [--top K]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(root: str) -> str:
    cands = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True))
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return cands[-1]


def normalize(name: str) -> str:
    # strip uniquing suffixes: fusion.123 -> fusion, dot.4 remains dot
    name = name.split("/")[-1]
    name = re.sub(r"\.\d+$", "", name)
    name = re.sub(r"_\d+$", "", name)
    return name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="logs/profile")
    ap.add_argument("--steps", type=int, default=8,
                    help="number of profiled steps (divides totals)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path = find_trace(args.root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # keep only the device "XLA Ops" lane — module/step lanes nest the same
    # time and would double-count
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lanes = {k for k, n in tid_names.items()
                if n == "XLA Ops" and "TPU" in pid_names.get(k[0], "")}

    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        dur = e.get("dur", 0)
        agg[normalize(e.get("name", "?"))] += dur
        total += dur
    print(f"trace: {path}")
    print(f"lanes: {[tid_names[k] for k in op_lanes]}")
    print(f"total device-op time: {total/1e3:.2f} ms over {args.steps} steps "
          f"=> {total/1e3/args.steps:.2f} ms/step\n")
    print(f"{'op family':44s} {'ms/step':>9s} {'%':>6s}")
    for name, dur in agg.most_common(args.top):
        print(f"{name[:44]:44s} {dur/1e3/args.steps:9.3f} {100*dur/total:5.1f}%")


if __name__ == "__main__":
    main()
