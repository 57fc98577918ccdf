"""Batched projection / backprojection geometry.

Semantics match the reference SPARF utilities
(`lib/bg_nerf/source/utils/geometry/batched_geometry_utils.py:199-270`) and
`lib/common.py:450-476` (`project_to_cam_real`) / `lib/common.py:76-110`
(`get_tensor_values` bilinear image sampling).
"""
from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return x[..., :-1] / (x[..., -1:] + eps)


def batch_project_to_other_img(
    kpi: jnp.ndarray,
    di: jnp.ndarray,
    Ki: jnp.ndarray,
    Kj: jnp.ndarray,
    T_itoj: jnp.ndarray,
    return_depth: bool = False,
):
    """Project pixels of image i (with depth di) into image j.

    kpi: [..., N, 2], di: [..., N], Ki/Kj: [..., 3, 3], T_itoj: [..., 4, 4].
    """
    if di.ndim == kpi.ndim:
        di = di[..., 0]
    kpi_3d_i = to_homogeneous(kpi) @ jnp.swapaxes(jnp.linalg.inv(Ki), -1, -2)
    kpi_3d_i = kpi_3d_i * di[..., None]
    kpi_3d_j = from_homogeneous(to_homogeneous(kpi_3d_i) @ jnp.swapaxes(T_itoj, -1, -2))
    kpi_j = from_homogeneous(kpi_3d_j @ jnp.swapaxes(Kj, -1, -2))
    if return_depth:
        return kpi_j, kpi_3d_j[..., -1]
    return kpi_j


def batch_backproject_to_3d(kpi: jnp.ndarray, di: jnp.ndarray, Ki: jnp.ndarray, T_itoj: jnp.ndarray) -> jnp.ndarray:
    """Backproject pixels [..., N, 2] with depths [..., N] into frame j (T_itoj [..., 4, 4])."""
    kpi_3d_i = to_homogeneous(kpi) @ jnp.swapaxes(jnp.linalg.inv(Ki), -1, -2)
    kpi_3d_i = kpi_3d_i * di[..., None]
    return from_homogeneous(to_homogeneous(kpi_3d_i) @ jnp.swapaxes(T_itoj, -1, -2))


def batch_project(kpi_3d_i: jnp.ndarray, T_itoj: jnp.ndarray, Kj: jnp.ndarray, return_depth: bool = False):
    """Project 3D points [..., N, 3] in frame i to pixels of image j."""
    kpi_3d_in_j = from_homogeneous(to_homogeneous(kpi_3d_i) @ jnp.swapaxes(T_itoj, -1, -2))
    kpi_2d_in_j = kpi_3d_in_j @ jnp.swapaxes(Kj, -1, -2)
    if return_depth:
        return from_homogeneous(kpi_2d_in_j), kpi_3d_in_j[..., -1]
    return from_homogeneous(kpi_2d_in_j)


def project_to_cam(points: jnp.ndarray, camera_mat: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., N, 3] -> pixel coords [..., N, 2] (perspective divide)."""
    xy = points @ jnp.swapaxes(camera_mat, -1, -2)
    return xy[..., :2] / (xy[..., 2:] + 1e-12)


def bilinear_image_sample(image: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample [H, W, C] image at [N, 2] (x, y) pixel coordinates.

    Replaces the reference's `F.grid_sample` image lookup (align_corners=True
    convention on the pixel lattice). Differentiable w.r.t. pixels.
    """
    H, W = image.shape[0], image.shape[1]
    x = jnp.clip(pixels[..., 0], 0.0, W - 1.0)
    y = jnp.clip(pixels[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def point_to_ray_distance(ray_origins: jnp.ndarray, ray_directions: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Distance of a point to rays; behind-origin rays use the origin distance.

    Mirrors reference `point_to_ray_distance` (`lib/recon_scene.py:312-318`).
    """
    v = point - ray_origins
    t = jnp.sum(v * ray_directions, axis=-1)
    dist_to_origin = jnp.linalg.norm(v, axis=-1)
    p_proj = ray_origins + t[..., None] * ray_directions
    dist_to_line = jnp.linalg.norm(point - p_proj, axis=-1)
    return jnp.where(t < 0, dist_to_origin, dist_to_line)
