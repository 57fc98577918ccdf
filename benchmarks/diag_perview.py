"""Per-view pose-error diagnostic for a saved synthetic-run checkpoint.

Loads a checkpoint, rebuilds the (deterministic) synthetic scene, composes
the current train poses, and prints the per-view R/t error under every
pairwise alignment anchor plus the Umeyama trajectory alignment. Built to
investigate the r3_6view_full metric flip-flop: the prealign score
(mean_R * mean_t) is near-degenerate between anchor pairs when one view is
an outlier, so the reported run metric toggles between gauges.

Usage: python benchmarks/diag_perview.py logs/r3_6view_full/last_ckpt.pkl [n_views]
"""
import pickle
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from poseprobe_tpu.core import align, pose as pose_ops
from poseprobe_tpu.data.synthetic import make_synthetic_scene
from poseprobe_tpu.models import pose_refine


def main(path: str, n_views: int = 6) -> None:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    poses_pnp = jnp.asarray(payload["poses_pnp"])
    se3 = {"se3_refine": jnp.asarray(payload["pose_params"]["se3_refine"])}
    cur = pose_refine.current_pose_pnp(se3, poses_pnp)

    data = make_synthetic_scene(n_train=n_views)
    gt = jnp.asarray(data.poses_gt_w2c[: data.n_train])

    print(f"{path}: {n_views} train views, step {payload.get('step')}")
    pose_c2w = pose_ops.pad(pose_ops.invert(cur))
    gt_c2w = pose_ops.pad(pose_ops.invert(gt))
    rows = []
    for a in range(n_views):
        for b in range(n_views):
            if a == b:
                continue
            aligned, _ = align._alignment_function(pose_c2w, gt_c2w, a, b)
            err = align.evaluate_camera_alignment(aligned, gt)
            score = float(err["t"].mean()) * float(err["R"].mean())
            rows.append((score, a, b, np.asarray(err["R"]), np.asarray(err["t"])))
    rows.sort(key=lambda r: r[0])
    print("top-5 anchor pairs by score (meanR*meant):")
    for score, a, b, R, t in rows[:5]:
        print(f"  anchor ({a},{b}) score {score:7.3f}  meanR {R.mean():6.3f} meant {t.mean():6.2f}")
        print(f"    per-view R: {np.array2string(R, precision=2)}")
        print(f"    per-view t: {np.array2string(t, precision=2)}")

    aligned_u, _ = align.prealign_w2c_large_camera_systems(cur, gt)
    err_u = align.evaluate_camera_alignment(aligned_u, gt)
    Ru, tu = np.asarray(err_u["R"]), np.asarray(err_u["t"])
    print(f"umeyama: meanR {Ru.mean():.3f} meant {tu.mean():.2f}")
    print(f"    per-view R: {np.array2string(Ru, precision=2)}")
    print(f"    per-view t: {np.array2string(tu, precision=2)}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 6)
