"""Final evaluation: pose alignment, test-time pose optimization, NVS metrics.

Rebuilds `Graph.evaluate_full` + `evaluate_test_time_photometric_optim`
(`lib/bg_nerf/source/models/renderer.py:1053-1210,1312-1337`) and the
small/large pose prealignment (`eval.py:699-813`):

1. align optimized train poses to GT (pairwise method for <10 views),
2. for each test view: map its GT pose into the optimized frame via the
   inverse sim3, then run N Adam steps on a per-image se3 refinement against
   the photometric loss (factoring pose error out of NVS numbers),
3. render the full image; report PSNR/SSIM(/LPIPS when weights are present)
   plus rotation/translation errors of the training poses.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import align, lie, pose as pose_ops, rays as rays_mod
from ..models import scene_nerf
from . import metrics as metrics_mod


def align_train_poses(pose_w2c: jnp.ndarray, pose_GT_w2c: jnp.ndarray):
    """Pose alignment; pairwise variant for small camera systems (<10 views)."""
    if pose_w2c.shape[0] < 10:
        return align.prealign_w2c_small_camera_systems(pose_w2c, pose_GT_w2c)
    return align.prealign_w2c_large_camera_systems(pose_w2c, pose_GT_w2c)


def test_time_pose_optim(
    scene_params: dict,
    scene_cfg: scene_nerf.SceneConfig,
    pose_w2c_init: jnp.ndarray,   # [3, 4] test pose mapped into optimized frame
    K: jnp.ndarray,
    image: jnp.ndarray,           # [H, W, 3]
    depth_range,
    n_iters: int = 100,
    lr: float = 1e-3,
    rand_rays: int = 1024,
    seed: int = 0,
    progress: float = 1.0,
    use_fine: bool | None = None,
    rot_only: bool = False,
    center_anchor: float = 0.0,
) -> jnp.ndarray:
    """Optimize a per-image se3 refinement photometrically (`renderer.py:1312-1337`).

    Also reused by the trainer as an activation-time pose warmup (align a
    newly activated view against the current scene before joint training
    touches it); pass `use_fine=False` before the fine phase starts.

    `rot_only=True` zeroes the translation tangent so the refine is a pure
    rotation in w2c composition — which keeps the camera CENTER invariant
    (C = -R^T t is unchanged by [R_r|0] ∘ [R|t]). Rationale: warmup against
    a blurry early-BARF render reliably fixes orientation but injects
    along-view-axis translation error (instrumented: t 6.6 -> 20.9 while
    R 2.2 -> 0.03); rotation must be right before its optimization window
    closes, while translation self-heals during the longer trans window.

    `center_anchor > 0` is the soft version of the same idea: a penalty
    `center_anchor * ||C(pose) - C(init)||^2` on the camera-center
    displacement from the seed. With one new view the photometric alignment
    is depth-ambiguous along the view axis — it reliably fixes rotation but
    inflates translation (queue33 instrumented: t 5.4 -> 23.9 while
    R 13.4 -> 0.03) — while PnP's camera center is usually good; the anchor
    keeps the center near the seed without freezing it (rot_only's failure
    mode: it cannot correct a genuinely bad seed center).
    """
    if use_fine is None:
        use_fine = scene_cfg.fine_sampling
    H, W = image.shape[:2]
    se3 = jnp.zeros((1, 6))
    opt = optax.adam(lr)
    opt_state = opt.init(se3)
    img_flat = image.reshape(-1, 3)

    @jax.jit
    def step(se3, opt_state, rng):
        ray_idx = jax.random.randint(rng, (rand_rays,), 0, H * W)
        pixels = jnp.stack([(ray_idx % W).astype(jnp.float32),
                            (ray_idx // W).astype(jnp.float32)], -1)

        def loss_fn(se3):
            refine = lie.se3_to_SE3(se3)[0]
            # rot_only: camera-side composition (refine AFTER world->cam), so
            # a zero-translation refine keeps the camera center exactly; the
            # default mirrors the reference's world-side refine
            pose = (pose_ops.compose_pair(pose_w2c_init, refine) if rot_only
                    else pose_ops.compose_pair(refine, pose_w2c_init))
            center, ray = rays_mod.get_center_and_ray_at_pixels(pose[None], pixels, K[None])
            rets = scene_nerf.render_rays(scene_params, scene_cfg, center, ray,
                                          depth_range, progress=progress, rng=None,
                                          compute_fine=use_fine,
                                          mode_train=False)
            rgb = rets.get("rgb_fine", rets["rgb"])
            target = img_flat[ray_idx]
            loss = ((rgb[0] - target) ** 2).mean()
            if center_anchor > 0:
                c_new = -pose[:3, :3].T @ pose[:3, 3]
                c_init = -pose_w2c_init[:3, :3].T @ pose_w2c_init[:3, 3]
                loss = loss + center_anchor * jnp.sum((c_new - c_init) ** 2)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(se3)
        if rot_only:
            g = g.at[..., 3:].set(0.0)  # se3 = [w | u]; freeze u
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(se3, up), opt_state, loss

    key = jax.random.PRNGKey(seed)
    for it in range(n_iters):
        key, sub = jax.random.split(key)
        se3, opt_state, _ = step(se3, opt_state, sub)
    refine = lie.se3_to_SE3(se3)[0]
    if rot_only:
        return pose_ops.compose_pair(pose_w2c_init, refine)
    return pose_ops.compose_pair(refine, pose_w2c_init)


def photometric_pose_score(scene_params, scene_cfg, pose_w2c, K, image,
                           depth_range, rand_rays: int = 2048, seed: int = 17,
                           progress: float = 1.0,
                           use_fine: bool | None = None) -> float:
    """Photometric MSE of `pose_w2c` against `image` on a FIXED ray subset.

    Deterministic (fixed seed) so two poses for the same view are directly
    comparable — used by the trainer's activation gate to detect PnP poses
    that reproject tightly but are geometrically degenerate (shallow match
    spread), and to accept a warmup result only when it actually helps."""
    if use_fine is None:
        use_fine = scene_cfg.fine_sampling
    H, W = image.shape[:2]
    n = min(rand_rays, H * W)
    ray_idx = jax.random.choice(jax.random.PRNGKey(seed), H * W, (n,),
                                replace=False)
    pixels = jnp.stack([(ray_idx % W).astype(jnp.float32),
                        (ray_idx // W).astype(jnp.float32)], -1)
    center, ray = rays_mod.get_center_and_ray_at_pixels(
        jnp.asarray(pose_w2c)[None], pixels, jnp.asarray(K)[None])
    rets = scene_nerf.render_rays(scene_params, scene_cfg, center, ray,
                                  depth_range, progress=progress, rng=None,
                                  compute_fine=use_fine, mode_train=False)
    rgb = rets.get("rgb_fine", rets["rgb"])
    target = image.reshape(-1, 3)[ray_idx]
    return float(((rgb[0] - target) ** 2).mean())


def render_full(scene_params, scene_cfg, pose_w2c, K, H, W, depth_range,
                chunk: int = 4096, use_fine: bool | None = None,
                progress: float = 1.0):
    """Chunked full-image render.

    `progress` MUST match the training progress of the checkpoint being
    rendered: BARF's coarse-to-fine PE masks zero the high-frequency bands
    during training, so their MLP input weights are still at init until the
    c2f window closes — rendering a mid-training state at progress=1.0
    injects untrained-band garbage (~15 dB on train views).
    """
    if use_fine is None:
        use_fine = scene_cfg.fine_sampling
    center, ray = rays_mod.get_center_and_ray(pose_w2c[None], H, W, K[None])
    suffix = "_fine" if use_fine else ""
    outs = {"rgb": [], "depth": [], "depth_var": [], "opacity": []}

    @jax.jit
    def render_chunk(c_chunk, r_chunk):
        return scene_nerf.render_rays(scene_params, scene_cfg, c_chunk, r_chunk,
                                      depth_range, progress=progress, rng=None,
                                      compute_fine=use_fine, mode_train=False)

    total = H * W
    pad = (-total) % chunk
    center_p = jnp.pad(center, ((0, 0), (0, pad), (0, 0)), mode="edge")
    ray_p = jnp.pad(ray, ((0, 0), (0, pad), (0, 0)), mode="edge")
    for c in range(0, total + pad, chunk):
        rets = render_chunk(center_p[:, c:c + chunk], ray_p[:, c:c + chunk])
        for k in outs:
            outs[k].append(rets[k + suffix])
    return {k: jnp.concatenate(v, axis=1)[:, :total].reshape(H, W, -1)
            for k, v in outs.items()}


def evaluate_full(
    scene_params: dict,
    scene_cfg: scene_nerf.SceneConfig,
    train_pose_w2c: jnp.ndarray,     # [B, 3, 4] optimized
    train_pose_GT_w2c: jnp.ndarray,  # [B, 3, 4]
    test_images: np.ndarray,         # [T, H, W, 3]
    test_pose_GT_w2c: jnp.ndarray,   # [T, 3, 4]
    test_Ks: jnp.ndarray,            # [T, 3, 3]
    depth_range,
    test_photo: bool = True,
    test_iter: int = 100,
    lr_pose: float = 1e-3,
    save_dir: str | None = None,
    progress: float = 1.0,
    test_depth_gt: np.ndarray | None = None,  # [T, H, W] camera-z, 0 = invalid
) -> dict[str, Any]:
    """Full test-set evaluation; returns the reference's JSON-style result dict.

    With `save_dir`, writes per-image gt|pred|depth panels and individual
    renders (role of `save_ind_files`/`visualize_eval`, `renderer.py:1339-1409`).
    """
    aligned, sim3 = align_train_poses(train_pose_w2c, train_pose_GT_w2c)
    err = align.evaluate_camera_alignment(aligned, train_pose_GT_w2c)

    H, W = test_images.shape[1:3]
    psnrs, ssims, lpips_vals = [], [], []
    depth_abs, depth_rmse = [], []
    for t in range(test_images.shape[0]):
        pose_in_opt_frame = align.backtrack_from_aligning_the_trajectory(
            test_pose_GT_w2c[t:t + 1], sim3)[0]
        if test_photo:
            pose_in_opt_frame = test_time_pose_optim(
                scene_params, scene_cfg, pose_in_opt_frame, test_Ks[t],
                jnp.asarray(test_images[t]), depth_range,
                n_iters=test_iter, lr=lr_pose, seed=t, progress=progress)
        out = render_full(scene_params, scene_cfg, pose_in_opt_frame, test_Ks[t],
                          H, W, depth_range, progress=progress)
        gt = jnp.asarray(test_images[t])
        psnrs.append(float(metrics_mod.psnr(out["rgb"], gt)))
        ssims.append(float(metrics_mod.ssim(out["rgb"], gt)))
        if metrics_mod.lpips_available():
            lpips_vals.append(metrics_mod.lpips_fn(out["rgb"], gt))
        if test_depth_gt is not None:
            # rendered depth is in the optimized-scene gauge; sim3.s is the
            # est->GT scale (reference `renderer.py:202-209,330-344`)
            a, r = metrics_mod.depth_abs_rmse(np.asarray(out["depth"]),
                                              test_depth_gt[t], scale=sim3.s)
            depth_abs.append(a)
            depth_rmse.append(r)
        if save_dir is not None:
            import imageio
            import os as _os

            from ..utils.vis import validation_panel

            _os.makedirs(save_dir, exist_ok=True)
            panel = validation_panel(np.asarray(gt), np.asarray(out["rgb"]),
                                     np.asarray(out["depth"]),
                                     np.asarray(out["opacity"][..., 0]))
            imageio.imwrite(_os.path.join(save_dir, f"test_{t:03d}.png"), panel)

    results = {
        "rot_error": float(err["R"].mean()),
        "trans_error": float(err["t"].mean()),
        "psnr": float(np.mean(psnrs)),
        # median alongside mean: a single near-degenerate test view (e.g. one
        # landing next to a train view) can inflate the mean ~2 dB (round-4
        # verdict weak #6); the median is robust to one outlier view.
        "psnr_median": float(np.median(psnrs)),
        "ssim": float(np.mean(ssims)),
        "ssim_median": float(np.median(ssims)),
        "psnr_per_img": psnrs,
        "ssim_per_img": ssims,
    }
    if lpips_vals:
        results["lpips"] = float(np.mean(lpips_vals))
    if depth_abs:
        results["depth_abs"] = float(np.nanmean(depth_abs))
        results["depth_rmse"] = float(np.nanmean(depth_rmse))
        results["depth_abs_per_img"] = depth_abs
    return results
