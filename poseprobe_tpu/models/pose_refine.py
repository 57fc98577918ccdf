"""Per-view SE(3) pose refinement parameters and pose composition.

Functional analog of `pose_model` (`lib/voxurf_coarse.py:27-39`) and the pose
assembly helpers `get_current_pose{,_pnp}` / `get_all_training_poses`
(`lib/recon_scene.py:36-74`). Poses are w2c [N, 3, 4].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lie, pose as pose_ops


def init_pose_params(n_train: int) -> dict:
    return {
        "se3_refine": jnp.zeros((n_train, 6), jnp.float32),
        "se3_align_refine": jnp.zeros((1, 6), jnp.float32),
    }


def make_pose_noise(key, n_train: int, camera_noise: float) -> jnp.ndarray:
    """Synthetic pose perturbation [N, 3, 4] (`voxurf_coarse.py:38-39`)."""
    se3_noise = jax.random.normal(key, (n_train, 6)) * camera_noise
    return lie.se3_to_SE3(se3_noise)


def current_pose_pnp(pose_params: dict, poses_pnp: jnp.ndarray,
                     fix_first: bool = True) -> jnp.ndarray:
    """Refined poses from the initialisation set.

    PnP mode fixes pose 0 as the gauge anchor: current[i] = pnp[i] o refine[i]
    for i > 0 (`recon_scene.py:61-69`). The noisy-GT mode
    (`get_current_pose`, `recon_scene.py:51-59`) refines every pose
    (fix_first=False).
    """
    pose_refine = lie.se3_to_SE3(pose_params["se3_refine"])
    # compose([refine, base]) = base o refine: the refinement acts innermost
    refined = pose_ops.compose_pair(pose_refine, poses_pnp)
    if not fix_first:
        return refined
    keep_first = jnp.arange(poses_pnp.shape[0])[:, None, None] == 0
    return jnp.where(keep_first, poses_pnp, refined)


def current_pose_noisy_gt(pose_params: dict, poses_gt: jnp.ndarray, pose_noise: jnp.ndarray) -> jnp.ndarray:
    """Refined poses from noisy GT: gt o noise o refine (`recon_scene.py:51-59`)."""
    noisy = pose_ops.compose_pair(pose_noise, poses_gt)
    pose_refine = lie.se3_to_SE3(pose_params["se3_refine"])
    return pose_ops.compose_pair(pose_refine, noisy)
