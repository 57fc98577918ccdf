"""Object-branch pose supervision: match reprojection via SDF surface points.

Mirrors `scene_rep_reconstruction.get_project_error` (`lib/recon_scene.py:321-369`)
and the VGG surface-feature loss `get_project_feature_loss` (`:371-439`).
Both cast rays through matched pixels, find the pose-probe surface, and
penalize reprojection disagreement in the paired view — this is how 2D
matches supervise the camera poses through the SDF.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core import geometry, pose as pose_ops, rays as rays_mod
from ..models import object_sdf
from .common import compute_diff_loss

NL = 0.05  # near-plane clamp for projections (`recon_scene.py:189`)


def _project_with_near_clamp(points_w, pose_w2c, K, inverse_y: bool, HW=None):
    """world2cam + near-z clamp + pinhole projection (`recon_scene.py:352-361`)."""
    pc = pose_ops.world2cam(points_w, pose_w2c)
    if inverse_y:
        invalid = pc[..., 2:] < NL
        pc = jnp.where(jnp.broadcast_to(invalid, pc.shape), NL, pc)
        px = geometry.project_to_cam(pc, K)
    else:
        invalid = -pc[..., 2:] < NL
        pc = jnp.where(jnp.broadcast_to(invalid, pc.shape), NL, pc)
        px = geometry.project_to_cam(pc, K)
        if HW is not None:
            px = px.at[..., 0].set(HW[1] - px[..., 0])
    return px, invalid[..., 0]


def projection_error_loss(
    obj_params: dict,
    obj_cfg: object_sdf.ObjectConfig,
    current_pose: jnp.ndarray,    # [n_views, 3, 4]
    Ks: jnp.ndarray,              # [n_views, 3, 3]
    coord_self: jnp.ndarray,      # [M, 2] pixels in view i
    coord_other: jnp.ndarray,     # [M, 2] pixels in view j
    mconf: jnp.ndarray,           # [M] confidences (0 = padding)
    id_i, id_j,                   # traced view indices (match: i <-> j)
    global_step,
    inverse_y: bool,
    use_deform: bool,
    pixel_thre: float | None = 200.0,
    near: float = 0.3,
    far: float = 4.0,
    HW=None,
    mask_grid=None,
    mask_k=None,
):
    """Returns (projection_dis_error, near_surface_loss).

    Both directions are stacked like the reference ([coord_i->view_j] and
    [coord_j->view_i], `recon_scene.py:323-325`). `mask_grid` enables
    free-space compaction inside the surface query (same as render).
    """
    coords = jnp.stack([coord_self, coord_other])  # [2, M, 2]
    src_idx = jnp.stack([id_i, id_j])
    dst_idx = jnp.stack([id_j, id_i])
    conf2 = jnp.concatenate([mconf[None], mconf[None]], axis=0)  # [2, M]

    c2w = pose_ops.invert(current_pose[src_idx])
    rays_o, rays_d = rays_mod.get_ray_dir(coords, Ks[src_idx], c2w, inverse_y=inverse_y,
                                          mode="no_center")
    flat_o = rays_o.reshape(-1, 3)
    flat_d = rays_d.reshape(-1, 3)

    if use_deform:
        pts, valid, _ = object_sdf.query_surface_points_render(
            obj_params, obj_cfg, flat_o, flat_d, global_step, use_deform=True,
            near=near, far=far, mask_grid=mask_grid, mask_k=mask_k)
    else:
        pts, valid, _ = object_sdf.query_surface_points(
            obj_params, obj_cfg, flat_o, flat_d, use_deform=False, near=near, far=far)

    # near-surface prior: matched rays should pass close to the probe bbox center
    center_pt = jnp.asarray(obj_cfg.xyz_min_np + obj_cfg.xyz_max_np)
    dis2center = geometry.point_to_ray_distance(flat_o, flat_d, center_pt)
    near_surface = (jnp.clip(dis2center - obj_cfg.diagonal_length / 2.0, min=0.0)
                    * (conf2.reshape(-1) > 0)).sum()

    pts = pts.reshape(2, -1, 3)
    valid = valid.reshape(2, -1)

    px, invalid_z = _project_with_near_clamp(pts, current_pose[dst_idx], Ks[dst_idx],
                                             inverse_y, HW)
    target = jnp.stack([coord_other, coord_self])
    diff = jnp.linalg.norm(px - target, axis=-1)  # [2, M]
    valid_all = (~invalid_z) & valid & (conf2 > 0)
    if pixel_thre is not None:
        valid_all = valid_all & (jax.lax.stop_gradient(diff) <= pixel_thre)
    proj_err = compute_diff_loss("huber", diff, weights=conf2, mask=valid_all, delta=1.0)
    return proj_err, near_surface


def surface_feature_loss(
    obj_params: dict,
    obj_cfg: object_sdf.ObjectConfig,
    current_pose: jnp.ndarray,
    Ks: jnp.ndarray,
    rays_o: jnp.ndarray,           # [M, 3] rays of view i (training rays subset)
    rays_d: jnp.ndarray,
    id_i, id_j,
    feature_maps: jnp.ndarray,     # [n_views, H', W', C] (e.g. VGG features, scaled to pixel grid)
    global_step,
    inverse_y: bool,
    use_deform: bool,
    near: float = 0.3,
    far: float = 4.0,
):
    """Cosine feature agreement of SDF-surface points projected into both views.

    Mirrors `get_project_feature_loss` (`recon_scene.py:371-439`): a cycle
    check via the paired view's own surface query gates validity.
    """
    pts, valid, _ = object_sdf.query_surface_points_render(
        obj_params, obj_cfg, rays_o, rays_d, global_step, use_deform=use_deform,
        near=near, far=far)

    # project into view j, re-cast rays there, and re-query the surface
    px_j, invalid_j = _project_with_near_clamp(pts[None], current_pose[id_j][None],
                                               Ks[id_j][None], inverse_y)
    c2w_j = pose_ops.invert(current_pose[id_j][None])
    ro_j, rd_j = rays_mod.get_ray_dir(px_j, Ks[id_j][None], c2w_j, inverse_y=inverse_y,
                                      mode="no_center")
    pts_ref, valid_ref, _ = object_sdf.query_surface_points_render(
        obj_params, obj_cfg, ro_j.reshape(-1, 3), rd_j.reshape(-1, 3), global_step,
        use_deform=use_deform, near=near, far=far)
    cycle_ok = jnp.linalg.norm(pts - pts_ref, axis=-1) < obj_cfg.voxel_size * 2

    px_i, invalid_i = _project_with_near_clamp(pts[None], current_pose[id_i][None],
                                               Ks[id_i][None], inverse_y)
    valid_all = (valid & valid_ref & cycle_ok & (~invalid_i[0]) & (~invalid_j[0])).astype(jnp.float32)

    f_i = geometry.bilinear_image_sample(feature_maps[id_i], px_i[0])
    f_j = geometry.bilinear_image_sample(feature_maps[id_j], px_j[0])
    cos = jnp.sum(f_i * f_j, -1) / (jnp.linalg.norm(f_i, axis=-1) * jnp.linalg.norm(f_j, axis=-1) + 1e-8)
    # masked mean cosine similarity -> loss (1 - mean_cos)
    mean_cos = (cos * valid_all).sum() / (valid_all.sum() + 1e-6)
    return 1.0 - mean_cos
