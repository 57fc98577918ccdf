"""Novel-view video synthesis: camera paths + rendering + encoding.

Rebuilds `generate_videos_synthesis` (`renderer.py:1212-1310`),
`get_novel_view_poses` oscillation paths (`lib/camera.py:371-381`) and the
spiral paths of `lib/gen_videos.py:72-136`. Videos are written with imageio
(no ffmpeg subprocess dependency).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..core import pose as pose_ops
from . import evaluator


def oscillation_poses(pose_anchor_w2c: jnp.ndarray, n: int = 60, scale: float = 1.0) -> jnp.ndarray:
    """Small circular oscillations around an anchor pose (`lib/camera.py:371-381`)."""
    theta = jnp.arange(n) / n * 2 * np.pi
    R_x = pose_ops.angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.1), "X")
    R_y = pose_ops.angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.1), "Y")
    pose_rot = pose_ops.make(R=R_y @ R_x)
    pose_shift = pose_ops.make(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_shift2 = pose_ops.make(t=jnp.array([0.0, 0.0, 3.8 * scale]))
    pose_oscil = pose_ops.compose([pose_shift, pose_rot, pose_shift2])
    return pose_ops.compose([pose_oscil, pose_anchor_w2c[None]])


def spiral_poses_from_trajectory(poses_c2w: np.ndarray, n: int = 60,
                                 n_rots: float = 2.0, zrate: float = 0.5,
                                 rad_scale: float = 1.0) -> np.ndarray:
    """LLFF-style spiral around the average training camera
    (`lib/gen_videos.py:72-136`). poses_c2w: [B, 3, 4]. Returns [n, 3, 4] c2w."""
    center = poses_c2w[:, :3, 3].mean(0)
    z_avg = poses_c2w[:, :3, 2].mean(0)
    z_avg = z_avg / np.linalg.norm(z_avg)
    up = -poses_c2w[:, :3, 1].mean(0)
    rads = np.abs(poses_c2w[:, :3, 3] - center).max(0) * rad_scale + 1e-6

    out = []
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n, endpoint=False):
        c = center + rads * np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate)])
        fwd = z_avg + 0.1 * (center - c)
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)
        out.append(np.concatenate([R, c[:, None]], axis=1))
    return np.stack(out).astype(np.float32)


def interp_poses_slerp(c2ws: np.ndarray, n_views: int) -> np.ndarray:
    """Slerp rotations + linear translations between keyframe c2w poses
    (`interp_poses`, `lib/common.py:551-562`). c2ws: [K, 3, 4] -> [n, 3, 4]."""
    from scipy.spatial.transform import Rotation, Slerp

    times = np.linspace(0, 1, c2ws.shape[0])
    slerp = Slerp(times, Rotation.from_matrix(c2ws[:, :3, :3]))
    tt = np.linspace(0, 1, n_views)
    rots = slerp(tt).as_matrix().astype(np.float32)
    trans = np.stack([np.interp(tt, times, c2ws[:, i, 3]) for i in range(3)], -1)
    return np.concatenate([rots, trans[:, :, None].astype(np.float32)], axis=2)


def interp_poses_bspline(c2ws: np.ndarray, n_views: int, degree: int = 2) -> np.ndarray:
    """B-spline translations + slerp rotations (`interp_poses_bspline`,
    `lib/common.py:565-575`)."""
    from scipy.interpolate import splev, splprep
    from scipy.spatial.transform import Rotation, Slerp

    pts = c2ws[:, :3, 3]
    k = min(degree, len(pts) - 1)
    tck, _ = splprep(pts.T, k=k, s=0)
    u = np.linspace(0, 1, n_views)
    trans = np.stack(splev(u, tck), -1).astype(np.float32)
    times = np.linspace(0, 1, c2ws.shape[0])
    slerp = Slerp(times, Rotation.from_matrix(c2ws[:, :3, :3]))
    rots = slerp(u).as_matrix().astype(np.float32)
    return np.concatenate([rots, trans[:, :, None]], axis=2)


def colorize_depth(depth: np.ndarray, d_range=None) -> np.ndarray:
    """Depth -> turbo-ish colormap [H, W, 3] uint8 (role of `colorize_np`)."""
    import matplotlib.cm as cm
    d = np.asarray(depth).squeeze()
    lo, hi = (d.min(), d.max()) if d_range is None else d_range
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    return (cm.get_cmap("turbo")(norm)[..., :3] * 255).astype(np.uint8)


def render_video(scene_params, scene_cfg, poses_w2c, K, H, W, depth_range,
                 out_path: str, fps: int = 10, depth_out_path: str | None = None):
    """Render a pose path and encode rgb (and optionally depth) videos."""
    import imageio

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    rgb_frames, depth_frames = [], []
    for i in range(poses_w2c.shape[0]):
        out = evaluator.render_full(scene_params, scene_cfg, jnp.asarray(poses_w2c[i]),
                                    jnp.asarray(K), H, W, depth_range)
        rgb_frames.append((np.clip(np.asarray(out["rgb"]), 0, 1) * 255).astype(np.uint8))
        depth_frames.append(colorize_depth(np.asarray(out["depth"]), depth_range))
    out_path = _write_animation(out_path, rgb_frames, fps)
    if depth_out_path:
        _write_animation(depth_out_path, depth_frames, fps)
    return out_path


def _write_animation(out_path: str, frames: list, fps: int) -> str:
    """mimwrite with a GIF fallback: mp4 needs an ffmpeg/pyav imageio backend
    that may not exist in a hermetic environment; GIF encodes via pillow,
    which is always present. Returns the path actually written."""
    import imageio

    try:
        imageio.mimwrite(out_path, frames, fps=fps)
        return out_path
    except (ValueError, ImportError):
        alt = os.path.splitext(out_path)[0] + ".gif"
        # pillow's GIF writer takes per-frame duration (ms), not fps
        imageio.mimwrite(alt, frames, duration=1000.0 / fps, loop=0)
        print(f"[video] no mp4 backend; wrote {alt} instead")
        return alt
