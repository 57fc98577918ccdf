"""Scene-branch losses: photometric + regularizers, correspondence, depth consistency.

TPU-native rebuild of the SPARF loss modules
(`lib/bg_nerf/source/training/core/`):
* `BasePhotoandReguLoss` — huber photometric (+fine), fg-mask, depth-patch
  charbonnier, mipnerf360 distortion (`base_losses.py:232-323`,
  `regularization_losses.py`).
* `CorrespondencesPairRenderDepthAndGet3DPtsAndReproject` — render depth at
  matched pixels of a view pair, backproject, reproject into the other view,
  huber pixel error both directions, coarse+fine averaged, weight halved
  every `corres_weight_reduct_at_x_iter` (`corres_loss.py:50-224`).
* `DepthConsistencyLoss` — pseudo-GT 3D from rendered ref depth, project to a
  pose interpolated toward the nearest neighbour, visibility from
  render-to-max-depth transmittance >= 0.2, huber depth agreement
  (`depth_cons_loss.py:45-333`).

All filtering (`valid_pts`, visibility) is expressed as weight masks over
fixed-size pixel sets — no boolean compaction — so everything jits with
static shapes.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core import geometry, pose as pose_ops, rays as rays_mod
from ..models import scene_nerf
from .common import compute_diff_loss, huber


# ---------------------------------------------------------------- photometric

def huber_loss_x2(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """huber(delta=0.5) * 2 (reference `BaseLoss.huber_loss`, `base_losses.py:155-156`)."""
    return huber(pred - label, delta=0.5).mean() * 2.0


def depth_patch_loss(depths: jnp.ndarray, patch_size: int, pad: float = 0.001) -> jnp.ndarray:
    """Charbonnier smoothness over depth patches (`regularization_losses.py:52-77`)."""
    B = depths.shape[0]
    d = depths.reshape(B, -1, patch_size**2)
    resid_sq = (d[..., None] - d[..., None, :]) ** 2
    return jnp.sqrt(resid_sq + pad**2).mean()


def distortion_loss(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """mipnerf360 distortion (`regularization_losses.py:21-49`). t, w: [B, R, N, 1]."""
    w = w[..., 0]
    t = t[..., 0]
    ut = (t[..., 1:] + t[..., :-1]) / 2
    wm = w[..., 1:]
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(wm * jnp.sum(wm[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w[..., 1:] ** 2 * jnp.diff(t, axis=-1), axis=-1) / 3
    return (loss_inter + loss_intra).mean()


def photometric_and_regu_loss(
    render_out: dict[str, Any],
    target_rgb: jnp.ndarray,      # [B, R, 3]
    opt: Any,                     # SceneTrainConfig-like (loss weights & knobs)
    fg_mask: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    lw = dict(opt.loss_weight) if isinstance(opt.loss_weight, tuple) else opt.loss_weight
    loss = {}
    if opt.huber_photometric:
        loss["render"] = huber_loss_x2(render_out["rgb"], target_rgb)
        if "rgb_fine" in render_out:
            loss["render"] = loss["render"] + huber_loss_x2(render_out["rgb_fine"], target_rgb)
    else:
        loss["render"] = ((render_out["rgb"] - target_rgb) ** 2).mean()
        if "rgb_fine" in render_out:
            loss["render"] = loss["render"] + ((render_out["rgb_fine"] - target_rgb) ** 2).mean()

    if fg_mask is not None and lw.get("fg_mask") is not None:
        m = 0.5 * jnp.abs(fg_mask - render_out["opacity"]).mean()
        if "opacity_fine" in render_out:
            m = m + 0.5 * jnp.abs(fg_mask - render_out["opacity_fine"]).mean()
        loss["fg_mask"] = m

    if lw.get("distortion") is not None:
        s = 1e-3 * 2
        d = s * distortion_loss(render_out["t"], render_out["weights"])
        if "weights_fine" in render_out:
            d = d + s * distortion_loss(render_out["t_fine"], render_out["weights_fine"])
        loss["distortion"] = d

    if lw.get("depth_patch") is not None:
        s = 0.01 * 2
        dp = s * depth_patch_loss(render_out["depth"], opt.depth_regu_patch_size)
        if "depth_fine" in render_out:
            dp = dp + s * depth_patch_loss(render_out["depth_fine"], opt.depth_regu_patch_size)
        loss["depth_patch"] = dp
    return loss


# -------------------------------------------------------------- correspondence

def _repro_loss_one_direction(pixels_self, depth_self, intr_self, pixels_other,
                              intr_other, T_self2other, conf, valid, diff_loss_type="huber"):
    pts_repr, _ = geometry.batch_project_to_other_img(
        pixels_self, di=depth_self, Ki=intr_self, Kj=intr_other,
        T_itoj=T_self2other, return_depth=True)
    return compute_diff_loss(diff_loss_type, pts_repr - pixels_other,
                             weights=conf, mask=valid, dim=-1)


def correspondence_pair_rays(poses_w2c, intr, pixels_self, pixels_other, id_self, id_other):
    """Ray origins/directions for both pixel sets of a match pair: [2, M, 3]."""
    pose_stack = jnp.stack([poses_w2c[id_self], poses_w2c[id_other]])   # [2, 3, 4]
    intr_stack = jnp.stack([intr[id_self], intr[id_other]])
    pixels_stack = jnp.stack([pixels_self, pixels_other])               # [2, M, 2]
    return rays_mod.get_center_and_ray_at_pixels(pose_stack, pixels_stack, intr_stack)


def correspondence_loss_from_depths(
    depth_pair: jnp.ndarray,              # [2, M] rendered coarse depth at (self, other) pixels
    depth_fine_pair: jnp.ndarray | None,  # [2, M] rendered fine depth, or None
    poses_w2c: jnp.ndarray,
    intr: jnp.ndarray,
    pixels_self: jnp.ndarray,
    pixels_other: jnp.ndarray,
    conf: jnp.ndarray,
    id_self, id_other,
    iteration,
    opt: Any,
) -> jnp.ndarray:
    """Reprojection part of the SPARF correspondence loss, given rendered
    depths at both pixel sets (`corres_loss.py:140-224`). Split from the
    render so the trainer can batch the pair rays into the main render call."""
    intr_self = intr[id_self]
    intr_other = intr[id_other]
    T_s2o = pose_ops.pad(poses_w2c[id_other]) @ pose_ops.invert_4x4(pose_ops.pad(poses_w2c[id_self]))
    T_o2s = pose_ops.invert_4x4(T_s2o)
    valid = (conf > 0)[:, None]
    conf_w = conf[:, None]

    def both_dirs(d):
        l1 = _repro_loss_one_direction(pixels_self, d[0], intr_self, pixels_other,
                                       intr_other, T_s2o, conf_w, valid, opt.diff_loss_type)
        l2 = _repro_loss_one_direction(pixels_other, d[1], intr_other, pixels_self,
                                       intr_self, T_o2s, conf_w, valid, opt.diff_loss_type)
        return l1 + l2

    loss = both_dirs(depth_pair)
    if depth_fine_pair is not None:
        loss = (loss + both_dirs(depth_fine_pair)) / 4.0
    else:
        loss = loss / 2.0

    # gradually decrease: halve every corres_weight_reduct_at_x_iter after start
    if opt.gradually_decrease_corres_weight:
        start = opt.iter_start_decrease_corres_weight
        gamma = 2.0 ** jnp.floor(jnp.maximum(iteration - start, 0) / opt.corres_weight_reduct_at_x_iter)
        gamma = jnp.where(iteration < start, 1.0, gamma)
        loss = loss / gamma
    return loss


def correspondence_loss(
    scene_params: dict,
    scene_cfg: scene_nerf.SceneConfig,
    poses_w2c: jnp.ndarray,        # [B, 3, 4] current estimates
    intr: jnp.ndarray,             # [B, 3, 3]
    pixels_self: jnp.ndarray,      # [M, 2] matched pixels in view id_self
    pixels_other: jnp.ndarray,     # [M, 2] matched pixels in view id_other
    conf: jnp.ndarray,             # [M] match confidences (0 = padding)
    id_self, id_other,             # traced scalars
    depth_range,
    progress,
    iteration,
    compute_fine: bool,
    opt: Any,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """SPARF correspondence loss for one random view pair (standalone form).

    Renders depth at both pixel sets jointly ([2, M] rays), reprojects each
    into the other view, huber on the pixel error (both directions; coarse and
    fine averaged). Padding matches carry conf=0 and are masked. The trainer
    instead batches the pair rays into the step's single render call and uses
    `correspondence_loss_from_depths` directly.
    """
    center, ray = correspondence_pair_rays(poses_w2c, intr, pixels_self, pixels_other,
                                           id_self, id_other)
    rets = scene_nerf.render_rays(scene_params, scene_cfg, center, ray, depth_range,
                                  progress, rng=rng, compute_fine=compute_fine,
                                  mode_train=True)
    depth_pair = rets["depth"][..., 0]
    depth_fine_pair = rets["depth_fine"][..., 0] if "depth_fine" in rets else None
    return correspondence_loss_from_depths(depth_pair, depth_fine_pair, poses_w2c, intr,
                                           pixels_self, pixels_other, conf,
                                           id_self, id_other, iteration, opt)


# ----------------------------------------------------------- depth consistency

def interpolate_pose_toward(poses_c2w: jnp.ndarray, id_self, w) -> jnp.ndarray:
    """Linear 4x4 blend between a pose and its nearest (by center distance)
    other training pose (`depth_cons_loss.py:45-63`; the reference's
    `get_nearest_pose_ids(angular_dist_method='vector')` reduces to nearest
    camera center for the live configs)."""
    centers = poses_c2w[:, :3, 3]
    d = jnp.linalg.norm(centers - centers[id_self][None], axis=-1)
    d = jnp.where(jnp.arange(d.shape[0]) == id_self, jnp.inf, d)
    id_other = jnp.argmin(d)
    blend = w * poses_c2w[id_self] + (1 - w) * poses_c2w[id_other]
    return pose_ops.invert_4x4(blend)


def depth_consistency_from_ref_depth(
    scene_params: dict,
    scene_cfg: scene_nerf.SceneConfig,
    poses_w2c: jnp.ndarray,       # [B, 3, 4]
    intr: jnp.ndarray,            # [B, 3, 3]
    pixels_ref: jnp.ndarray,      # [P, 2] pixels in the reference view
    depth_ref: jnp.ndarray,       # [P] rendered depth at those pixels
    id_self,                      # traced scalar: reference view index
    interp_w,                     # traced scalar in [0, 1]: pose interpolation
    H: int, W: int,
    depth_range,
    progress,
    iteration,
    compute_fine: bool,
    opt: Any,
    rng: jax.Array | None = None,
    ref_valid: jnp.ndarray | None = None,  # [P] extra validity (e.g. conf > 0)
) -> jnp.ndarray:
    """Depth consistency given an already-rendered reference depth.

    The reference's reuse path (`compute_loss_from_existing_pixels`,
    `depth_cons_loss.py:65-120`): the pseudo-GT pixels/depths come from the
    correspondence-loss render of the same step, saving one full 1024-ray
    render. Filters (`valid_pts`, visibility >= 0.2) become multiplicative
    weights; poses are detached like the reference (`depth_cons_loss.py:170-174`).
    """
    poses_w2c = jax.lax.stop_gradient(poses_w2c)
    poses_44 = pose_ops.pad(poses_w2c)
    poses_c2w = pose_ops.invert_4x4(poses_44)

    intr_ref = intr[id_self]
    pose_c2w_ref = poses_c2w[id_self]
    pts3d_w = geometry.batch_backproject_to_3d(pixels_ref, depth_ref, intr_ref, pose_c2w_ref)

    # unseen pose between ref and its nearest neighbour
    pose_w2c_unseen = interpolate_pose_toward(poses_c2w, id_self, interp_w)

    # project pseudo-GT into the unseen view
    pts_img, pseudo_depth = geometry.batch_project(pts3d_w, T_itoj=pose_w2c_unseen,
                                                   Kj=intr_ref, return_depth=True)
    valid_pts = (
        (pts_img[:, 0] >= 0) & (pts_img[:, 1] >= 0)
        & (pts_img[:, 0] <= W - 1) & (pts_img[:, 1] <= H - 1)
        & (pseudo_depth >= depth_range[0])
    )
    if ref_valid is not None:
        valid_pts = valid_pts & ref_valid
    pts_img_safe = jnp.clip(pts_img, 0.0, jnp.asarray([W - 1.0, H - 1.0]))

    # visibility from render-up-to-max-depth transmittance (no grad)
    center_u, ray_u = rays_mod.get_center_and_ray_at_pixels(pose_w2c_unseen[:3], pts_img_safe, intr_ref)
    vis_out = jax.lax.stop_gradient(
        scene_nerf.render_rays_to_max(scene_params, scene_cfg, center_u, ray_u,
                                      depth_range[0], jax.lax.stop_gradient(pseudo_depth)[None],
                                      progress, compute_fine=compute_fine))
    vis_key = "all_cumulated_fine" if "all_cumulated_fine" in vis_out else "all_cumulated"
    visibility = vis_out[vis_key][0]  # [P]
    vis_ok = visibility >= 0.2
    weight_mask = (valid_pts & vis_ok).astype(jnp.float32)

    # rendered depth at the projected pixels in the unseen view
    ret_u = scene_nerf.render_rays(scene_params, scene_cfg, center_u, ray_u, depth_range,
                                   progress, rng=rng, compute_fine=compute_fine)

    def one(depth_key, opacity_key):
        d = ret_u[depth_key][0, :, 0]
        acc = jax.lax.stop_gradient(ret_u[opacity_key][0, :, 0])
        # masked mean over the points that survive the validity+visibility
        # filters, matching the reference's filtered-array normalization
        return compute_diff_loss(opt.diff_loss_type, pseudo_depth - d,
                                 weights=visibility * acc, mask=weight_mask)

    loss = one("depth", "opacity")
    if "depth_fine" in ret_u:
        loss = loss + one("depth_fine", "opacity_fine")
    return loss


def depth_consistency_loss(
    scene_params: dict,
    scene_cfg: scene_nerf.SceneConfig,
    poses_w2c: jnp.ndarray,       # [B, 3, 4]
    intr: jnp.ndarray,            # [B, 3, 3]
    pixels_ref: jnp.ndarray,      # [P, 2] random pixels in the reference view
    id_self,                      # traced scalar: reference view index
    interp_w,                     # traced scalar in [0, 1]: pose interpolation
    H: int, W: int,
    depth_range,
    progress,
    iteration,
    compute_fine: bool,
    use_fine_depth_as_ref: bool,
    opt: Any,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Depth consistency with a fresh reference render (the reference's
    `compute_loss` path, `depth_cons_loss.py:128-340`): renders depth at
    `pixels_ref` first, then defers to `depth_consistency_from_ref_depth`."""
    detached_poses = jax.lax.stop_gradient(poses_w2c)
    pose_w2c_ref = pose_ops.pad(detached_poses)[id_self]
    intr_ref = intr[id_self]
    center, ray = rays_mod.get_center_and_ray_at_pixels(pose_w2c_ref[:3], pixels_ref, intr_ref)
    rng_a, rng_b = jax.random.split(rng) if rng is not None else (None, None)
    ret_ref = scene_nerf.render_rays(scene_params, scene_cfg, center, ray, depth_range,
                                     progress, rng=rng_a, compute_fine=compute_fine)
    depth_ref = (ret_ref["depth_fine"] if (use_fine_depth_as_ref and "depth_fine" in ret_ref)
                 else ret_ref["depth"])[0, :, 0]
    return depth_consistency_from_ref_depth(
        scene_params, scene_cfg, poses_w2c, intr, pixels_ref, depth_ref, id_self,
        interp_w, H, W, depth_range, progress, iteration, compute_fine, opt, rng=rng_b)
