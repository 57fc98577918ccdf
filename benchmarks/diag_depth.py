"""Diagnose the large depth_abs in the synthetic eval: probe vs background.

The canonical eval reports depth_abs ~1.0 ray-units while PSNR is 32+ —
either geometry is genuinely off (floaters / wall pulled forward) or the
expected-depth estimator is biased in a specific region. This renders a ray
subset of each test view on CPU and splits the error by region (probe-hit
vs background wall, center vs image border), plus opacity stats, so the
journal can name the mechanism instead of guessing.

Usage:
  python benchmarks/diag_depth.py --ckpt logs/r3_3view_60k_c/last_ckpt.pkl \
      --n_views 3 [--probe cube] [--rays 4096]
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n_views", type=int, default=3)
    p.add_argument("--probe", type=str, default="cube")
    p.add_argument("--rays", type=int, default=4096)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import run as run_mod
    from poseprobe_tpu.core import align, rays as rays_mod
    from poseprobe_tpu.data.loaders import load_data
    from poseprobe_tpu.eval import evaluator
    from poseprobe_tpu.models import scene_nerf
    from poseprobe_tpu.train import state as state_mod
    from poseprobe_tpu.train.trainer import JointTrainer

    ns = argparse.Namespace(config="", datadir="", scene="", synthetic=True,
                            n_views=args.n_views)
    cfg = run_mod.load_config(ns)
    data = load_data(cfg.data, n_train=args.n_views, probe=args.probe)
    trainer = JointTrainer(cfg, data)
    trainer.state = state_mod.restore_state(
        trainer.state, state_mod.load_checkpoint(args.ckpt))
    print(f"[diag] restored step {trainer.state.step}")

    cur = trainer.current_pose_host()
    aligned, sim3 = evaluator.align_train_poses(cur, trainer.poses_gt)
    print(f"[diag] sim3 scale est->GT: {sim3.s:.4f}")

    depth_gt = data.depth_gt  # [N, H, W] ray-distance t
    H, W = data.images.shape[1:3]
    rng = np.random.default_rng(0)
    scene_params = trainer.state.scene_params

    for t_i, t in enumerate(data.i_test):
        pose = align.backtrack_from_aligning_the_trajectory(
            jnp.asarray(data.poses_gt_w2c[t:t + 1]), sim3)[0]
        idx = rng.choice(H * W, size=args.rays, replace=False)
        pixels = jnp.stack([(idx % W).astype(jnp.float32),
                            (idx // W).astype(jnp.float32)], -1)
        center, ray = rays_mod.get_center_and_ray_at_pixels(
            pose[None], pixels, jnp.asarray(data.Ks[t])[None])
        rets = scene_nerf.render_rays(
            scene_params, cfg.scene_model, center, ray,
            (cfg.data.near, cfg.data.far), progress=1.0, rng=None,
            compute_fine=cfg.scene_model.fine_sampling, mode_train=False)
        sfx = "_fine" if cfg.scene_model.fine_sampling else ""
        pred = np.asarray(rets["depth" + sfx][0, :, 0]) * sim3.s
        opac = np.asarray(rets["opacity" + sfx][0, :, 0])
        gt = depth_gt[t].reshape(-1)[idx]
        err = np.abs(pred - gt)

        px, py = idx % W, idx // W
        border = ((px < W // 8) | (px >= W - W // 8) |
                  (py < H // 8) | (py >= H - H // 8))
        probe_hit = gt < 4.0  # probe at ~2.2-2.6, wall >= ~5 ray-units
        signed = pred - gt

        def stat(name, m):
            if m.sum() == 0:
                return
            print(f"  {name:22s} n={int(m.sum()):5d} abs={err[m].mean():.3f} "
                  f"signed={signed[m].mean():+.3f} gt={gt[m].mean():.2f} "
                  f"opac={opac[m].mean():.3f}")

        print(f"[diag] test view {t_i} (img {t}): abs={err.mean():.3f} "
              f"rmse={np.sqrt((signed ** 2).mean()):.3f}")
        stat("probe", probe_hit)
        stat("background", ~probe_hit)
        stat("bg center", ~probe_hit & ~border)
        stat("bg border", ~probe_hit & border)
        # unscaled comparison: is the sim3 scale helping or hurting?
        err_unscaled = np.abs(pred / sim3.s - gt)
        print(f"  unscaled abs={err_unscaled.mean():.3f}")


if __name__ == "__main__":
    main()
