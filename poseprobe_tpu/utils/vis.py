"""Visualization: object-branch full renders, validation panels, pose plots.

Rebuilds the live pieces of `lib/nvs_fun.py` (`render_viewpoints:39`,
`visualize_val_image:211`), `lib/utils_vis.py` pose-cloud plots (`:232-268`)
and depth colorization (`:405-511`).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pose as pose_ops, rays as rays_mod
from ..models import object_sdf


def render_object_image(obj_params, obj_cfg, pose_w2c, K, H, W, inverse_y: bool,
                        near: float, far: float, bg: float = 0.0, chunk: int = 4096):
    """Full-image render through the object branch (chunked, eval mode).

    Analog of `render_viewpoints` (`lib/nvs_fun.py:39-188`) for one view.
    Returns dict(rgb [H, W, 3], depth [H, W], normal [H, W, 3], opacity [H, W]).
    """
    c2w = pose_ops.invert(pose_w2c[None])[0]
    ro, rd = rays_mod.get_rays(H, W, K, c2w, inverse_y=inverse_y)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    @jax.jit
    def render_chunk(ro_c, rd_c, vd_c):
        out = object_sdf.render(obj_params, obj_cfg, ro_c, rd_c, vd_c,
                                global_step=0.0, rng=None, is_train=False,
                                near=near, far=far, bg=bg)
        return out["rgb_marched"], out["depth"], out["normal_marched"], out["cum_weights"]

    total = H * W
    pad = (-total) % chunk
    ro_p = jnp.pad(ro, ((0, pad), (0, 0)), mode="edge")
    rd_p = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge")
    vd_p = jnp.pad(vd, ((0, pad), (0, 0)), mode="edge")
    outs = {"rgb": [], "depth": [], "normal": [], "opacity": []}
    for c in range(0, total + pad, chunk):
        rgb, depth, normal, op = render_chunk(ro_p[c:c + chunk], rd_p[c:c + chunk], vd_p[c:c + chunk])
        outs["rgb"].append(rgb)
        outs["depth"].append(depth)
        outs["normal"].append(normal)
        outs["opacity"].append(op[:, 0])
    return {
        "rgb": jnp.concatenate(outs["rgb"])[:total].reshape(H, W, 3),
        "depth": jnp.concatenate(outs["depth"])[:total].reshape(H, W),
        "normal": jnp.concatenate(outs["normal"])[:total].reshape(H, W, 3),
        "opacity": jnp.concatenate(outs["opacity"])[:total].reshape(H, W),
    }


def validation_panel(gt_rgb: np.ndarray, pred_rgb: np.ndarray, depth: np.ndarray,
                     opacity: np.ndarray | None = None) -> np.ndarray:
    """[H, n*W, 3] uint8 side-by-side panel (gt | pred | depth | opacity).

    Role of the bg-NeRF val grids (`renderer.py:169-295`) and
    `visualize_val_image` (`nvs_fun.py:211`).
    """
    from ..eval.video import colorize_depth

    tiles = [
        (np.clip(np.asarray(gt_rgb), 0, 1) * 255).astype(np.uint8),
        (np.clip(np.asarray(pred_rgb), 0, 1) * 255).astype(np.uint8),
        colorize_depth(np.asarray(depth)),
    ]
    if opacity is not None:
        op = np.clip(np.asarray(opacity), 0, 1)
        tiles.append((np.repeat(op[..., None], 3, -1) * 255).astype(np.uint8))
    return np.concatenate(tiles, axis=1)


def plot_save_poses(fig_path: str, pose_aligned_w2c, pose_ref_w2c=None, scale: float = 1.0):
    """3D camera-frustum plot (role of `plot_save_poses_blender`, `utils_vis.py:232-268`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def frustum_points(w2c, s=0.1 * scale):
        c2w = np.asarray(pose_ops.invert(jnp.asarray(w2c)))
        center = c2w[:, :3, 3]
        z = c2w[:, :3, :3] @ np.array([0, 0, s])
        return center, center + z

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    c0, z0 = frustum_points(pose_aligned_w2c)
    ax.scatter(*c0.T, color="tab:blue", label="estimated")
    for a, b in zip(c0, z0):
        ax.plot(*np.stack([a, b]).T, color="tab:blue")
    if pose_ref_w2c is not None:
        c1, z1 = frustum_points(pose_ref_w2c)
        ax.scatter(*c1.T, color="tab:red", label="GT")
        for a, b in zip(c1, z1):
            ax.plot(*np.stack([a, b]).T, color="tab:red")
        for a, b in zip(c0, c1):
            ax.plot(*np.stack([a, b]).T, color="gray", linewidth=0.5)
    ax.legend()
    os.makedirs(os.path.dirname(fig_path) or ".", exist_ok=True)
    fig.savefig(fig_path, dpi=80)
    plt.close(fig)
    return fig_path


def save_match_plot(fig_path: str, img_i: np.ndarray, img_j: np.ndarray, pack: np.ndarray,
                    max_draw: int = 64):
    """Side-by-side match visualization (role of `make_matching_plot`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    H = max(img_i.shape[0], img_j.shape[0])
    W = img_i.shape[1] + img_j.shape[1]
    canvas = np.zeros((H, W, 3), np.float32)
    canvas[: img_j.shape[0], : img_j.shape[1]] = np.asarray(img_j)[..., :3]
    canvas[: img_i.shape[0], img_j.shape[1]:] = np.asarray(img_i)[..., :3]
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.imshow(canvas)
    valid = pack[:, 4] > 0
    sel = np.where(valid)[0][:max_draw]
    for k in sel:
        xj, yj, xi, yi = pack[k, :4]
        ax.plot([xj, xi + img_j.shape[1]], [yj, yi], linewidth=0.6)
    ax.axis("off")
    os.makedirs(os.path.dirname(fig_path) or ".", exist_ok=True)
    fig.savefig(fig_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return fig_path
