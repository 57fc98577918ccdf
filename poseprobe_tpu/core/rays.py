"""Camera ray generation.

Two pixel conventions coexist in the reference and both are kept:

* Object branch (`lib/voxurf_coarse.py:1339-1407`): rays built from a c2w
  [3,4] matrix with explicit ``inverse_y/flip_x/flip_y`` handling of the
  intrinsics sign conventions.
* Scene branch (`lib/bg_nerf/source/utils/camera.py:347-420`): rays built by
  unprojecting homogeneous pixel coords through K^-1 and a w2c pose.

All functions are batched, jit-safe, and produce static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import pose as pose_ops


def pixel_grid(H: int, W: int, mode: str = "center", dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] (x, y) pixel coordinates."""
    x = jnp.arange(W, dtype=dtype)
    y = jnp.arange(H, dtype=dtype)
    if mode == "center":
        x = x + 0.5
        y = y + 0.5
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([X, Y], axis=-1)


def get_rays(
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    inverse_y: bool,
    flip_x: bool = False,
    flip_y: bool = False,
    mode: str = "center",
):
    """Per-pixel rays for the object branch. Returns (rays_o, rays_d), each [H, W, 3].

    Mirrors reference `get_rays` (`lib/voxurf_coarse.py:1339-1368`).
    """
    xy = pixel_grid(H, W, mode=mode)
    i, j = xy[..., 0], xy[..., 1]
    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = jnp.stack(
            [(i - K[0][2]) / K[0][0], (j - K[1][2]) / K[1][1], jnp.ones_like(i)], -1
        )
    else:
        dirs = jnp.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)], -1
        )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_ray_dir(
    points: jnp.ndarray,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    inverse_y: bool,
    flip_x: bool = False,
    flip_y: bool = False,
    mode: str = "center",
):
    """Rays through specific 2D pixel coords (object branch PnP/reprojection path).

    points: [B, N, 2]; K: [B, 3, 3]; c2w: [B, 3, 4].
    Returns (rays_o, rays_d) each [B, N, 3] with unit-norm directions.
    Mirrors reference `get_ray_dir` (`lib/recon_scene.py:93-113`).
    """
    del flip_x, flip_y  # reference flips are no-ops for [B,N,2] coord lists
    if mode == "center":
        points = points + 0.5
    px, py = points[..., 0], points[..., 1]
    if inverse_y:
        dirs = jnp.stack(
            [
                (px - K[:, 0, None, 2]) / K[:, 0, None, 0],
                (py - K[:, 1, None, 2]) / K[:, 1, None, 1],
                jnp.ones_like(px),
            ],
            -1,
        )
    else:
        dirs = jnp.stack(
            [
                (px - K[:, 0, None, 2]) / K[:, 0, None, 0],
                -(py - K[:, 1, None, 2]) / K[:, 1, None, 1],
                -jnp.ones_like(px),
            ],
            -1,
        )
    rays_d = jnp.einsum("bnc,brc->bnr", dirs, c2w[:, :3, :3])
    rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
    rays_o = jnp.broadcast_to(c2w[:, None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def get_center_and_ray(pose_w2c: jnp.ndarray, H: int, W: int, intr: jnp.ndarray):
    """Scene-branch ray generation: centers + (non-normalized) directions.

    pose_w2c: [B, 3, 4]; intr: [B, 3, 3]. Returns ([B, HW, 3], [B, HW, 3]).
    Mirrors `get_center_and_ray` (`lib/bg_nerf/source/utils/camera.py:347`).
    """
    B = pose_w2c.shape[0]
    xy = pixel_grid(H, W, mode="center").reshape(-1, 2)  # [HW, 2]
    xy = jnp.broadcast_to(xy, (B,) + xy.shape)
    grid_3d = pose_ops.img2cam(pose_ops.to_hom(xy), intr)  # [B, HW, 3]
    center_3d = jnp.zeros_like(grid_3d)
    grid_3d = pose_ops.cam2world(grid_3d, pose_w2c)
    center_3d = pose_ops.cam2world(center_3d, pose_w2c)
    return center_3d, grid_3d - center_3d


def get_center_and_ray_at_pixels(pose_w2c: jnp.ndarray, pixels: jnp.ndarray, intr: jnp.ndarray):
    """Scene-branch rays at arbitrary pixels [..., N, 2] (adds the +0.5 center).

    Mirrors `get_center_and_ray_at_pixels` (`source/utils/camera.py:384`).
    """
    if pose_w2c.ndim == 2:
        pose_w2c = pose_w2c[None]
    if intr.ndim == 2:
        intr = intr[None]
    if pixels.ndim == 2:
        pixels = jnp.broadcast_to(pixels, (pose_w2c.shape[0],) + pixels.shape)
    pts = pixels + 0.5
    grid_3d = pose_ops.img2cam(pose_ops.to_hom(pts), intr)
    center_3d = jnp.zeros_like(grid_3d)
    grid_3d = pose_ops.cam2world(grid_3d, pose_w2c)
    center_3d = pose_ops.cam2world(center_3d, pose_w2c)
    return center_3d, grid_3d - center_3d


def get_3d_points_from_depth(center: jnp.ndarray, ray: jnp.ndarray, depth: jnp.ndarray, multi_samples: bool = False):
    """x = c + d*v (reference `lib/camera.py:320-324`)."""
    if multi_samples:
        center, ray = center[:, :, None], ray[:, :, None]
    return center + ray * depth


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift rays to the near plane and project to NDC (reference `lib/voxurf_coarse.py:1382-1399`)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
