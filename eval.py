"""Standalone evaluation CLI: load a checkpoint, evaluate NVS + poses, render video.

Analog of the reference `eval.py` driver: reload the trained state, align the
optimized poses to GT, run per-test-image test-time photometric pose
optimization, report PSNR/SSIM(/LPIPS) and rotation/translation errors, and
optionally render novel-view videos and evaluate the extracted mesh.

Usage:
    python eval.py --config <preset.py> --datadir <path> --ckpt logs/<exp>/last_ckpt.pkl \
        [--render_video] [--eval_mesh --gt_stl path/to/stl_total.ply]
"""
from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="")
    p.add_argument("--datadir", type=str, default="")
    p.add_argument("--scene", type=str, default="",
                   help="scene/scan selector for family presets (see run.py)")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--probe", type=str, default="cube",
                   choices=["cube", "sphere"],
                   help="synthetic scene: probe shape (must match the run)")
    p.add_argument("--n_views", type=int, default=0,
                   help="synthetic-only: number of training views the ckpt was trained with")
    p.add_argument("--n_test", type=int, default=0,
                   help="synthetic-only: held-out view count (must match the run)")
    p.add_argument("--res", type=int, default=0,
                   help="synthetic-only: image H=W (must match the run)")
    p.add_argument("--texture", type=str, default="checker",
                   choices=["checker", "noise"],
                   help="synthetic-only: surface texture (must match the run)")
    p.add_argument("--no_test_optim", action="store_true")
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--eval_mesh", action="store_true")
    p.add_argument("--mesh_only", action="store_true",
                   help="skip the NVS/pose eval; just extract + score the mesh")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (mesh-only eval needs no TPU)")
    p.add_argument("--gt_stl", type=str, default="")
    p.add_argument("--matcher", type=str, default="auto")
    args = p.parse_args()

    import numpy as np
    if args.cpu:
        import jax
        # the axon site hook pins JAX_PLATFORMS; config update wins (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import run as run_mod
    from poseprobe_tpu.core import align
    from poseprobe_tpu.data.loaders import load_data
    from poseprobe_tpu.eval import dtu_protocol, evaluator, mesh as mesh_mod, video as video_mod
    from poseprobe_tpu.models import object_sdf
    from poseprobe_tpu.train import state as state_mod
    from poseprobe_tpu.train.trainer import JointTrainer

    cfg = run_mod.load_config(args)
    loader_kwargs = {}
    if args.n_views and cfg.data.dataset_type == "synthetic":
        loader_kwargs["n_train"] = args.n_views
    if args.probe != "cube" and cfg.data.dataset_type == "synthetic":
        loader_kwargs["probe"] = args.probe
    if cfg.data.dataset_type == "synthetic":
        if args.n_test:
            loader_kwargs["n_test"] = args.n_test
        if args.res:
            loader_kwargs["H"] = loader_kwargs["W"] = args.res
        if args.texture != "checker":
            loader_kwargs["texture"] = args.texture
    data = load_data(cfg.data, matcher_backend=args.matcher, **loader_kwargs)
    trainer = JointTrainer(cfg, data)
    payload = state_mod.load_checkpoint(args.ckpt)
    trainer.state = state_mod.restore_state(trainer.state, payload)
    trainer.restore_host_extras(state_mod.get_extras(payload))
    print(f"[eval] restored step {trainer.state.step} from {args.ckpt}")

    out_dir = args.out_dir or os.path.join(cfg.basedir, cfg.expname, "eval")
    os.makedirs(out_dir, exist_ok=True)

    cur = trainer.current_pose_host()

    def run_one(test_optim: bool, save: bool):
        return evaluator.evaluate_full(
            trainer.state.scene_params, cfg.scene_model,
            cur, trainer.poses_gt,
            data.images[data.i_test], jnp.asarray(data.poses_gt_w2c[data.i_test]),
            jnp.asarray(data.Ks[data.i_test]), (data.near, data.far),
            test_photo=test_optim, test_iter=cfg.scene_train.test_iter,
            save_dir=os.path.join(out_dir, "test_renders") if save else None,
            progress=min(trainer.state.step / cfg.scene_model.max_iter, 1.0),
            test_depth_gt=None if data.depth_gt is None
            else data.depth_gt[data.i_test])

    if not args.mesh_only:
        # reference saves both blocks for the joint model (`recon_scene.py:906-929`)
        results = {"iteration": trainer.state.step}
        if not args.no_test_optim and cfg.scene_train.test_photo:
            results["w_test_optim"] = run_one(True, save=True)
            results["without_test_optim"] = run_one(False, save=False)
        else:
            results.update(run_one(False, save=True))
        print(json.dumps(results, indent=2))
        with open(os.path.join(out_dir, f"{cfg.expname}.json"), "w") as f:
            json.dump(results, f, indent=2)

    if args.eval_mesh or args.mesh_only:
        vol = object_sdf.extract_sdf_volume(trainer.state.obj_params, cfg.object_model,
                                            resolution=256)
        verts, tris = mesh_mod.extract_mesh_world(
            vol, cfg.object_model.xyz_min_np, cfg.object_model.xyz_max_np,
            scale_mat=data.scale_mats)
        comp_info = {}
        if len(verts):
            # drop salt-noise junk shells from the noisy far-field SDF
            # region (standard cleaned-mesh protocol; the kept fraction is
            # recorded in chamfer.json for transparency)
            verts, tris, comp_info = mesh_mod.filter_small_components(
                verts, tris)
            print(f"[eval] component filter: {comp_info}")
        if len(verts) == 0:
            # degenerate probe geometry: the deformed SDF has no zero
            # crossing inside the bbox (observed: sphere-probe "filled box"
            # basin — the probe anchors poses fine but carries no surface).
            # Emit a scored-as-failure JSON instead of crashing the eval.
            diag = {"error": "empty mesh",
                    "vol_min": float(vol.min()), "vol_max": float(vol.max()),
                    "vol_frac_inside": float((vol > 0).mean())}
            print("[eval] mesh extraction empty:", diag)
            with open(os.path.join(out_dir, "chamfer.json"), "w") as f:
                json.dump(diag, f, indent=2)
            verts = tris = None
        else:
            mesh_mod.save_ply(os.path.join(out_dir, "mesh.ply"), verts, tris)
        if verts is None:
            pass
        elif args.gt_stl and os.path.exists(args.gt_stl):
            gt_pts = dtu_protocol.load_stl_points(args.gt_stl)
            chamfer = dtu_protocol.evaluate_mesh_dtu(verts, tris, gt_pts)
            print("[eval] chamfer:", chamfer)
            with open(os.path.join(out_dir, "chamfer.json"), "w") as f:
                json.dump(chamfer, f, indent=2)
        elif cfg.data.dataset_type == "synthetic":
            # hermetic geometry protocol: the probe surface is analytic, so
            # the "GT scan" is exact (the DTU analog of stl_total.ply). Mesh
            # verts live in the TRAINED gauge; carry them into GT units with
            # the same sim3 that aligns the train poses for the pose metrics.
            from poseprobe_tpu.data import synthetic as synth_mod
            _, sim3 = align.prealign_w2c_small_camera_systems(
                cur, data.poses_gt_w2c[data.i_train])
            verts_gt = align.apply_sim3_points(verts, sim3)
            gt_pts = synth_mod.probe_surface_points(probe=args.probe)
            pad = 0.15
            bbox = np.stack([gt_pts.min(0) - pad, gt_pts.max(0) + pad])
            # observation-mask culling (lib/dtu_eval.py ObsMask analog): the
            # SDF is unconstrained outside the training views' visual hull,
            # and the GT back side was never observed — neither is scored.
            tr = data.i_train

            def pred_cull(p):
                # visual hull AND observed space: the hull alone cannot
                # remove junk in the probe's occluded shadow cone (it
                # projects inside the silhouette in every view yet was never
                # supervised by any ray) — that region is exactly what DTU's
                # ObsMask excludes (`observed_space_cull` docstring).
                # Measured on r4_3view_classical: hull-only chamfer 0.153
                # with ~50% of raw mesh area behind the probe.
                keep = dtu_protocol.visual_hull_cull(
                    p, data.masks[tr], data.poses_gt_w2c[tr], data.Ks[tr])
                if data.depth_gt is not None:
                    # tol 0.1: at 3 views a tight tolerance over-culls real
                    # surface seen only at grazing angles (s2d 0.234 at 0.05
                    # vs 0.182 at 0.1 on the same mesh, junk removal equal)
                    keep &= dtu_protocol.observed_space_cull(
                        p, data.depth_gt[tr], data.poses_gt_w2c[tr],
                        data.Ks[tr], tol=0.1)
                return keep

            # SYMMETRIC culling (round-5, DTU ObsMask spirit): GT is culled
            # by the SAME criterion as pred. The previous gt_cull
            # (visible_in_any_view) was weaker than pred's hull+observed-
            # space cull, so GT points whose perfect reconstruction would
            # itself have been culled from pred were scored as "missing"
            # by construction (benchmarks/diag_s2d.py: ~1/3 of the round-4
            # s2d term; on the same r4_3view_classical mesh the asymmetric
            # protocol scores overall 0.1525 vs 0.1401 symmetric).
            chamfer = dtu_protocol.evaluate_mesh_dtu(
                verts_gt, tris, gt_pts, bbox=bbox, max_dist=0.5,
                pred_cull=pred_cull,
                gt_cull=pred_cull if data.depth_gt is not None else None)
            chamfer["sim3_scale"] = sim3.s
            chamfer.update({f"mesh_{k}": v for k, v in comp_info.items()})
            print("[eval] synthetic GT chamfer (world units):", chamfer)
            with open(os.path.join(out_dir, "chamfer.json"), "w") as f:
                json.dump(chamfer, f, indent=2)

    if args.render_video:
        c2w = np.asarray(jnp.linalg.inv(
            jnp.concatenate([cur, jnp.tile(jnp.asarray([[[0, 0, 0, 1.0]]]), (cur.shape[0], 1, 1))],
                            axis=1)))[:, :3]
        spiral_c2w = video_mod.spiral_poses_from_trajectory(c2w, n=60)
        spiral_w2c = np.stack([np.concatenate(
            [s[:3, :3].T, (-s[:3, :3].T @ s[:3, 3])[:, None]], 1) for s in spiral_c2w])
        video_mod.render_video(trainer.state.scene_params, cfg.scene_model,
                               spiral_w2c, data.Ks[data.i_train[0]], data.H, data.W,
                               (data.near, data.far),
                               os.path.join(out_dir, "spiral_rgb.mp4"),
                               depth_out_path=os.path.join(out_dir, "spiral_depth.mp4"))
    print("[eval] done.")


if __name__ == "__main__":
    main()
