"""Collect headline numbers from run-result JSONs into one README-ready table.

Round-4 verdict weak #1/#4: README rows diverged from their committed JSONs
(stale pre-fix artifacts, a 0.152-vs-0.178 chamfer mismatch). This tool
makes the sync mechanical: every quoted number is read from the run's own
`<expname>.json` / `eval_mesh_gt/chamfer.json`, never typed by hand.

Usage: python benchmarks/collect_results.py logs/r5_3view_classical [more...]
"""
from __future__ import annotations

import glob
import json
import os
import sys


def one(run_dir: str) -> dict:
    name = os.path.basename(run_dir.rstrip("/"))
    out = {"run": name}
    cands = glob.glob(os.path.join(run_dir, "*.json"))
    res_path = next((p for p in cands if os.path.basename(p).startswith(name)
                     or os.path.basename(p) == f"{name}.json"), None)
    if res_path is None:
        res_path = next((p for p in cands if "ckpt" not in p
                         and "chamfer" not in p), None)
    if res_path:
        with open(res_path) as f:
            r = json.load(f)
        blk = r.get("w_test_optim", r)
        for k_out, k_in in [("R", "rot_error"), ("t100", "trans_error"),
                            ("psnr", "psnr"), ("psnr_med", "psnr_median"),
                            ("ssim", "ssim"), ("depth_abs", "depth_abs")]:
            if k_in in blk:
                # trans_error is ALREADY the x100 convention (core/align.py)
                out[k_out] = round(blk[k_in], 3)
        out["json"] = os.path.relpath(res_path)
    ch_path = os.path.join(run_dir, "eval_mesh_gt", "chamfer.json")
    if os.path.exists(ch_path):
        with open(ch_path) as f:
            ch = json.load(f)
        for k in ("d2s", "s2d", "overall", "overall_icp", "sim3_scale"):
            if k in ch:
                out[f"ch_{k}"] = round(ch[k], 4)
    return out


def main():
    runs = sys.argv[1:] or sorted(glob.glob("logs/r5_*"))
    rows = [one(r) for r in runs if os.path.isdir(r)]
    keys = ["run", "R", "t100", "psnr", "psnr_med", "ssim", "depth_abs",
            "ch_overall", "ch_overall_icp", "json"]
    for row in rows:
        print("  ".join(f"{k}={row[k]}" for k in keys if k in row))


if __name__ == "__main__":
    main()
