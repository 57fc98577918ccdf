"""Multi-chip convergence mini-run on the virtual 8-device CPU mesh.

Round-3 verdict #7: the 8-device story rested on one-step parity tests plus
the driver's dryrun. This runs a REAL multi-hundred-step joint training
protocol (incremental activation, PnP, object phase, fine sampling,
supersteps) twice — single-device and on an 8-device ``('data',)`` mesh —
and records metric parity at superstep granularity, plus an A/B of the
sharded full-image eval render. Writes one JSON artifact.

Usage:  python benchmarks/multichip_convergence.py [--steps 400]
CPU-only by construction (virtual device mesh; no TPU/tunnel involvement).
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_trainer(mesh):
    from poseprobe_tpu.config import config as cfg_mod
    from poseprobe_tpu.data.synthetic import make_synthetic_scene
    from poseprobe_tpu.models.object_sdf import ObjectConfig
    from poseprobe_tpu.models.scene_nerf import SceneConfig
    from poseprobe_tpu.train.trainer import JointTrainer

    data = make_synthetic_scene(n_train=3, n_test=2, H=32, W=32, seed=0)
    margin = float(data.xyz_max[0])
    cfg = cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=True, incremental_step=100,
                                    barf_c2f=(0.6, 1.0)),
        pnp=cfg_mod.PnPConfig(use_pnp=True),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=24**3, num_voxels_base=24**3, N_iters=200,
            world_bound_scale=1.25),
        object_train=cfg_mod.ObjectTrainConfig(N_iters=200, N_rand=128),
        scene_model=SceneConfig(rand_rays=128, sample_intvs=24,
                                sample_intvs_fine=24, max_iter=400,
                                fine_sampling=True,
                                ratio_start_fine_sampling_at_x=0.5),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=400,
                                             start_ratio_depth_cons=0.5),
    )
    return JointTrainer(cfg, data, seed=0, mesh=mesh), data


def run(mesh, steps, superstep):
    tr, data = make_trainer(mesh)
    trace = []
    t0 = time.time()
    tr.fit(steps, log_every=25, superstep=superstep,
           callback=lambda h: trace.append(
               {"step": h["step"], "loss": h["loss_total"],
                "psnr_scene": h.get("psnr_scene")}))
    wall = time.time() - t0
    val = tr.validate()
    img = np.asarray(tr.render_full_image(tr.poses_gt[0], tr.Ks[0],
                                          chunk=256, fine=True)["rgb"])
    return tr, trace, float(val), img, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--superstep", type=int, default=25)
    ap.add_argument("--out", type=str, default="logs/r4_multichip/convergence.json")
    args = ap.parse_args()

    from poseprobe_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8, jax.devices()
    print(f"[mc] devices: {len(jax.devices())} ({jax.devices()[0].platform})")

    tr1, trace1, val1, img1, wall1 = run(None, args.steps, args.superstep)
    print(f"[mc] single-device: {args.steps} steps in {wall1:.0f}s, "
          f"val PSNR {val1:.2f}")
    tr8, trace8, val8, img8, wall8 = run(make_mesh(jax.devices()[:8]),
                                         args.steps, args.superstep)
    print(f"[mc] 8-device mesh: {args.steps} steps in {wall8:.0f}s, "
          f"val PSNR {val8:.2f}")

    # metric parity at superstep granularity
    assert len(trace1) == len(trace8)
    loss_delta = [abs(a["loss"] - b["loss"]) / max(abs(a["loss"]), 1e-9)
                  for a, b in zip(trace1, trace8)]
    img_delta = float(np.abs(img1 - img8).max())
    result = {
        "steps": args.steps, "superstep": args.superstep,
        "n_devices": 8, "platform": str(jax.devices()[0].platform),
        "val_psnr_single": round(val1, 4), "val_psnr_mesh8": round(val8, 4),
        "val_psnr_abs_delta": round(abs(val1 - val8), 4),
        # parity tiers: the FIRST superstep is layout-only (measured 1e-6
        # rel), later steps diverge chaotically through reduction-order fp
        # noise amplified by the object phase's sharpening dynamics, and the
        # runs land in the same basin (val PSNR delta ~0.02 dB)
        "loss_rel_delta_first_superstep": round(loss_delta[0], 9),
        "loss_rel_delta_max": round(max(loss_delta), 6),
        "eval_render_abs_delta_max": round(img_delta, 7),
        "trace_single": trace1, "trace_mesh8": trace8,
        "wall_s_single": round(wall1, 1), "wall_s_mesh8": round(wall8, 1),
        "note": ("virtual 8-device CPU mesh; sharding constraints change "
                 "layout, not math — fp divergence grows only through "
                 "reduction-order noise amplified by training dynamics"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    brief = {k: v for k, v in result.items() if not k.startswith("trace")}
    print(json.dumps(brief, indent=2))


if __name__ == "__main__":
    main()
