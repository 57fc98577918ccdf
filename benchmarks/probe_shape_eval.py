"""Probe-shape quality: deformed-SDF surface vs the analytic probe.

The object branch initializes as a CUBE SDF and relies on the SIREN
deformation field to adapt to the actual probe (reference
`lib/deformation/deform_net.py`; mesh path `recon_scene.py:846-875`).
With `--probe sphere` the synthetic scene renders a sphere of radius
`cube_half`, so "did the deformation field learn the shape" is exactly
measurable: extract the deformed-SDF mesh from a checkpoint, sample its
surface, and report radial statistics + symmetric chamfer against analytic
surface samples of the ground-truth probe.

    python benchmarks/probe_shape_eval.py --ckpt logs/r3_3view_sphere/last_ckpt.pkl \
        --probe sphere [--cpu]

Prints one JSON line: chamfer (mm-free, scene units), mean/median |r - R|
(sphere) or |max-coord - half| (cube), and mesh stats.
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def analytic_surface_samples(probe: str, half: float, n: int, seed: int = 0) -> np.ndarray:
    from poseprobe_tpu.data.synthetic import probe_surface_points
    return probe_surface_points(n, half=half, probe=probe, seed=seed).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--probe", default="sphere", choices=["sphere", "cube"])
    ap.add_argument("--half", type=float, default=0.35)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--n_samples", type=int, default=20000)
    ap.add_argument("--no_deform", action="store_true",
                    help="extract the UNDEFORMED grid SDF (ablation: how far "
                         "the raw grid is from the probe without the warp)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import argparse as _ap

    import run as run_mod
    from poseprobe_tpu.eval import mesh as mesh_mod
    from poseprobe_tpu.models import object_sdf
    from poseprobe_tpu.train import state as state_mod

    payload = state_mod.load_checkpoint(args.ckpt)
    # ckpts store params, not configs (train/state.py); reconstruct the SAME
    # ObjectConfig run.py builds for --synthetic (bbox (-0.56, 0.56), 64^3 —
    # the default ExperimentConfig bbox is different and yields garbage
    # trilerp coords -> an empty mesh)
    cfg = run_mod.load_config(_ap.Namespace(synthetic=True, config="")).object_model
    params = jax.tree.map(lambda x: x, payload["obj_params"])

    vol = object_sdf.extract_sdf_volume(params, cfg, resolution=args.resolution,
                                        use_deform=not args.no_deform)
    verts, tris = mesh_mod.extract_mesh_world(vol, cfg.xyz_min_np, cfg.xyz_max_np)
    if len(verts) == 0:
        print(json.dumps({"error": "empty mesh"}))
        return

    pred = mesh_mod.sample_mesh_surface(verts, tris, args.n_samples)
    gt = analytic_surface_samples(args.probe, args.half, args.n_samples)
    d_pg, d_gp, chamfer = mesh_mod.chamfer_distance(pred, gt)

    if args.probe == "sphere":
        resid = np.abs(np.linalg.norm(pred, axis=-1) - args.half)
    else:
        resid = np.abs(np.abs(pred).max(axis=-1) - args.half)

    out = {
        "metric": "probe_chamfer",
        "probe": args.probe,
        "deform": not args.no_deform,
        "chamfer": float(chamfer),
        "pred_to_gt": float(d_pg),
        "gt_to_pred": float(d_gp),
        "surf_abs_mean": float(resid.mean()),
        "surf_abs_median": float(np.median(resid)),
        "surf_abs_p95": float(np.percentile(resid, 95)),
        "half": args.half,
        "n_verts": int(len(verts)),
        "n_tris": int(len(tris)),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
