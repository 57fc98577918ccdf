"""Object-phase collapse diagnosis on a non-cube probe (CPU).

Queue31's real-TPU sphere-probe run converged on poses/NVS but its OBJECT
branch collapsed: the raw SDF grid ended all-positive (no inside region,
`probe_shape_eval` -> empty mesh), so PnP anchored on garbage depth and the
photometric warmup/rescue machinery carried the run. This script reproduces
the object phase at tiny scale and logs raw-grid stats every chunk to find
when/why the inside region drains (suspects: deform priors pinning the cube
init while the NeuS s-schedule sharpens past the point of recovery; mask-BCE
carving outrunning the grid's ability to re-form the smaller shape).

    python benchmarks/debug_probe_collapse.py --probe sphere [--steps 1500]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="sphere", choices=["sphere", "cube"])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--object_iters", type=int, default=0,
                    help="override N_iters (default: --steps, pure object phase)")
    ap.add_argument("--s_ratio", type=float, default=0.0,
                    help="override the NeuS sharpness schedule ratio (0 = default)")
    ap.add_argument("--deform_prior_init", type=float, default=-1.0,
                    help="override the deform-prior initial weight (<0 = default)")
    ap.add_argument("--voxels", type=int, default=32,
                    help="object grid resolution per axis (CPU-runnable scale)")
    ap.add_argument("--n_rand", type=int, default=256,
                    help="object-phase ray batch")
    ap.add_argument("--scene_samples", type=int, default=32,
                    help="scene branch depth samples (coarse and fine)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the axon TPU (default: CPU; obey the queue "
                         "discipline — one TPU process at a time)")
    ap.add_argument("--full_scale", action="store_true",
                    help="production sizes (64^3 grid, N_rand 1024, 128 scene "
                         "samples) — pair with --tpu")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import run as run_mod
    from poseprobe_tpu.data.loaders import load_data
    from poseprobe_tpu.models import object_sdf
    from poseprobe_tpu.train.trainer import JointTrainer

    import dataclasses

    n_iters = args.object_iters or args.steps
    cfg = run_mod.load_config(argparse.Namespace(synthetic=True, config=""))
    max_iter = max(args.steps, 4000)
    if args.full_scale:
        args.voxels, args.n_rand, args.scene_samples, args.hw = 64, 1024, 128, 64
    obj_model_over = {"N_iters": n_iters,
                      "num_voxels": args.voxels**3,
                      "num_voxels_base": args.voxels**3}
    if args.s_ratio > 0:
        obj_model_over["s_ratio"] = args.s_ratio
    obj_train_over = {"N_iters": n_iters, "N_rand": args.n_rand}
    if args.deform_prior_init >= 0:
        obj_train_over["weight_deform_prior_init"] = args.deform_prior_init
    cfg = dataclasses.replace(
        cfg,
        object_model=dataclasses.replace(cfg.object_model, **obj_model_over),
        object_train=dataclasses.replace(cfg.object_train, **obj_train_over),
        scene_model=dataclasses.replace(
            cfg.scene_model, max_iter=max_iter,
            sample_intvs=args.scene_samples,
            sample_intvs_fine=args.scene_samples,
            rand_rays=args.n_rand),
        scene_train=dataclasses.replace(cfg.scene_train, max_iter=max_iter))

    data = load_data(cfg.data, H=args.hw, W=args.hw, probe=args.probe)
    trainer = JointTrainer(cfg, data)

    def grid_stats():
        raw = np.asarray(trainer.state.obj_params["sdf_grid"])
        a = float(object_sdf.softplus10(trainer.state.obj_params["sdf_alpha"]))
        b = float(object_sdf.softplus10(trainer.state.obj_params["sdf_beta"]))
        return {
            "raw_min": round(float(raw.min()), 3),
            "raw_max": round(float(raw.max()), 3),
            "frac_inside": round(float((raw < 0).mean()), 4),
            "alpha": round(a, 3), "beta": round(b, 4),
        }

    print(json.dumps({"step": 0, **grid_stats()}))
    hist = []
    for start in range(0, args.steps, args.chunk):
        h = trainer.fit(args.chunk, log_every=args.chunk)
        m = h[-1] if h else {}
        rec = {"step": trainer.state.step, **grid_stats(),
               "psnr_obj": round(m.get("psnr_obj", 0.0), 2),
               "loss_render": round(m.get("loss_render", 0.0), 5),
               "s_val": round(m.get("s_val", 0.0), 4)}
        hist.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
