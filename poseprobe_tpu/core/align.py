"""Pose-set alignment: procrustes, sim(3) Umeyama, pairwise small-set alignment.

Reproduces the reference evaluation machinery:
* `procrustes_analysis` (`lib/camera.py:352-369`)
* `align_ate_c2b_use_a2b` sim3 trajectory alignment (`lib/align_trajectories.py:231-307`)
* `prealign_w2c_small_camera_systems` pairwise alignment, robust for <10 views
  (`eval.py:723-813`)
* `prealign_w2c_large_camera_systems` (`eval.py:699-720`)
* `backtrack_from_aligning_the_trajectory` (`eval.py:815-821`)
* `evaluate_camera_alignment` R(deg)/t(x100) errors (`lib/recon_scene.py:79-91`)

These run at init/eval time (not in the hot loop); plain jnp with host-side
numpy fallbacks for SVD robustness.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import lie, pose as pose_ops


@dataclasses.dataclass
class Sim3:
    """Similarity transform estimated from aligned camera sets.

    Applies as: aligned_c2w_t = R @ (s * t) + t0 (exact form depends on `type`).
    """

    R: jnp.ndarray  # [1, 3, 3]
    t: jnp.ndarray  # [1, 3, 1]
    s: float
    type: str = "traj_align"


def procrustes_analysis(X0: jnp.ndarray, X1: jnp.ndarray):
    """Similarity alignment of point sets [N, 3]: X1to0 = (X1-t1)/s1 @ R.T * s0 + t0."""
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c**2).sum(axis=-1).mean())
    U, _, Vt = jnp.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    R = R * jnp.where(jnp.linalg.det(R) < 0, jnp.array([1.0, 1.0, -1.0]), 1.0)[None, :]
    return dict(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R)


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares sim3: y ~= s * R @ x + t. x, y: [3, N]. Returns (R, t, s)."""
    mean_x = x.mean(axis=1, keepdims=True)
    mean_y = y.mean(axis=1, keepdims=True)
    n = x.shape[1]
    sigma_x = ((x - mean_x) ** 2).sum() / n
    cov_xy = (y - mean_y) @ (x - mean_x).T / n
    U, D, Vt = np.linalg.svd(cov_xy)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = float(np.trace(np.diag(D) @ S) / sigma_x) if with_scale else 1.0
    t = mean_y - s * R @ mean_x
    return R, t[:, 0], s


def align_ate_c2b_use_a2b(traj_a_c2w: jnp.ndarray, traj_b_c2w: jnp.ndarray):
    """Align trajectory a to b with a sim3 over camera centers (method='sim3').

    traj_*: [N, 3, 4] c2w. Returns (aligned c2w [N, 4, 4], Sim3).
    """
    ta = np.asarray(traj_a_c2w[:, :3, 3]).T  # [3, N]
    tb = np.asarray(traj_b_c2w[:, :3, 3]).T
    R, t, s = umeyama_alignment(ta, tb, with_scale=True)
    R_j = jnp.asarray(R, dtype=jnp.float32)
    t_j = jnp.asarray(t, dtype=jnp.float32)
    R_a = traj_a_c2w[:, :3, :3]
    t_a = traj_a_c2w[:, :3, 3:]
    R_aligned = R_j[None] @ R_a
    t_aligned = s * (R_j[None] @ t_a) + t_j.reshape(1, 3, 1)
    aligned = pose_ops.pad(jnp.concatenate([R_aligned, t_aligned], axis=-1))
    sim3 = Sim3(R=R_j[None], t=t_j.reshape(1, 3, 1), s=s, type="traj_align")
    return aligned, sim3


def evaluate_camera_alignment(pose_aligned_w2c: jnp.ndarray, pose_GT_w2c: jnp.ndarray):
    """Rotation (deg) and translation (x100) errors between aligned and GT w2c poses."""
    pose_aligned_c2w = pose_ops.invert(pose_aligned_w2c)
    pose_GT_c2w = pose_ops.invert(pose_GT_w2c)
    R_aligned, t_aligned = pose_aligned_c2w[..., :3], pose_aligned_c2w[..., 3]
    R_GT, t_GT = pose_GT_c2w[..., :3], pose_GT_c2w[..., 3]
    R_error = lie.rotation_distance(R_aligned, R_GT) * 180.0 / np.pi
    t_error = jnp.linalg.norm(t_aligned - t_GT, axis=-1) * 100.0
    return dict(R=R_error, t=t_error)


def prealign_w2c_large_camera_systems(pose_w2c: jnp.ndarray, pose_GT_w2c: jnp.ndarray):
    """Sim3 trajectory alignment; identity fallback if SVD fails."""
    pose_c2w = pose_ops.invert(pose_w2c)
    pose_GT_c2w = pose_ops.invert(pose_GT_w2c)
    try:
        aligned_c2w, sim3 = align_ate_c2b_use_a2b(pose_c2w, pose_GT_c2w)
        pose_aligned_w2c = pose_ops.invert(aligned_c2w[:, :3])
    except Exception:
        pose_aligned_w2c = pose_w2c
        sim3 = Sim3(R=jnp.eye(3)[None], t=jnp.zeros((1, 3, 1)), s=1.0)
    return pose_aligned_w2c, sim3


def _alignment_function(poses_c2w_from: jnp.ndarray, poses_c2w_to: jnp.ndarray, idx_a: int, idx_b: int):
    """Scale by one pair's baseline, then align to the first pose of the pair."""
    dist_from = jnp.linalg.norm(poses_c2w_from[idx_a, :3, 3] - poses_c2w_from[idx_b, :3, 3])
    dist_to = jnp.linalg.norm(poses_c2w_to[idx_a, :3, 3] - poses_c2w_to[idx_b, :3, 3])
    scale = dist_to / (dist_from + 1e-12)
    scaled = poses_c2w_from.at[:, :3, 3].multiply(scale) if hasattr(poses_c2w_from, "at") else poses_c2w_from
    transformation = poses_c2w_to[idx_a] @ pose_ops.invert_4x4(scaled[idx_a])
    aligned_c2w = transformation[None] @ scaled
    aligned_w2c = pose_ops.invert_4x4(aligned_c2w)
    sim3 = Sim3(R=transformation[:3, :3][None], t=transformation[:3, 3].reshape(1, 3, 1), s=float(scale))
    return aligned_w2c[:, :3], sim3


def prealign_w2c_small_camera_systems(pose_w2c: jnp.ndarray, pose_GT_w2c: jnp.ndarray):
    """Try every pose pair as the alignment anchor; keep the lowest R*t error.

    Robust replacement for procrustes when there are <10 views (`eval.py:723-813`).
    """
    pose_c2w = pose_ops.pad(pose_ops.invert(pose_w2c))
    pose_GT_c2w = pose_ops.pad(pose_ops.invert(pose_GT_w2c))
    B = pose_c2w.shape[0]
    best = None
    for pair_id_0 in range(min(B, 10)):
        for pair_id_1 in range(min(B, 10)):
            if pair_id_0 == pair_id_1:
                continue
            aligned_w2c, sim3 = _alignment_function(pose_c2w, pose_GT_c2w, pair_id_0, pair_id_1)
            err = evaluate_camera_alignment(aligned_w2c, pose_GT_w2c)
            score = float(err["t"].mean()) * float(err["R"].mean())
            if best is None or score < best[0]:
                best = (score, aligned_w2c, sim3)
    return best[1], best[2]


def backtrack_from_aligning_the_trajectory(pose_GT_w2c: jnp.ndarray, sim3: Sim3) -> jnp.ndarray:
    """Map GT test w2c poses into the optimized coordinate system (inverse sim3)."""
    pose_GT_c2w = pose_ops.invert(pose_GT_w2c)
    R_T = jnp.swapaxes(sim3.R, -2, -1)
    R_aligned = R_T @ pose_GT_c2w[:, :3, :3]
    t_aligned = (R_T / sim3.s) @ (pose_GT_c2w[:, :3, 3:4] - sim3.t)
    aligned_c2w = pose_ops.make(R=R_aligned, t=t_aligned.reshape(-1, 3))
    return pose_ops.invert(aligned_c2w)
