"""Exact (host-float64) pose-error re-evaluation of saved checkpoints — CPU only.

Pose metrics need no rendering: load the checkpointed pose state, align to GT
with the pairwise small-camera-system method, and report per-view R (deg,
arcsin form — exact near zero) and t (x100) under float64. Lets every
historical run's pose numbers be reconciled with the exact metric without
touching the TPU tunnel.

Usage:
    python benchmarks/pose_errors_f64.py logs/r3_3view_rescue/last_ckpt.pkl --n_views 3
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpts", nargs="+", help="checkpoint .pkl paths")
    p.add_argument("--n_views", type=int, required=True)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import run as run_mod
    from poseprobe_tpu.core import align
    from poseprobe_tpu.data.loaders import load_data
    from poseprobe_tpu.train import state as state_mod
    from poseprobe_tpu.train.trainer import JointTrainer

    ns = argparse.Namespace(synthetic=True, config="", datadir="")
    cfg = run_mod.load_config(ns)
    data = load_data(cfg.data, matcher_backend="auto", n_train=args.n_views)
    trainer = JointTrainer(cfg, data)

    for ck in args.ckpts:
        payload = state_mod.load_checkpoint(ck)
        trainer.state = state_mod.restore_state(trainer.state, payload)
        cur = trainer.current_pose_host()
        aligned, _ = align.prealign_w2c_small_camera_systems(cur, trainer.poses_gt)
        err = align.evaluate_camera_alignment(aligned, trainer.poses_gt)
        print(json.dumps({
            "ckpt": ck,
            "step": int(trainer.state.step),
            "R_deg_mean": float(np.mean(err["R"])),
            "t_x100_mean": float(np.mean(err["t"])),
            "R_deg_per_view": [float(x) for x in np.asarray(err["R"])],
            "t_x100_per_view": [float(x) for x in np.asarray(err["t"])],
        }))


if __name__ == "__main__":
    main()
