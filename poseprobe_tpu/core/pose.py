"""Camera pose ([..., 3, 4] = [R|t] world->camera) operations.

Functional analog of the reference `Pose` class (`lib/camera.py:51-99`) and
4x4 helpers (`lib/camera.py:10-49`). All ops are batched and jit/grad-safe.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def make(R: jnp.ndarray | None = None, t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Construct a [..., 3, 4] pose from rotation and/or translation."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, dtype=jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid pose without a matrix inverse (R is orthonormal)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = (-R_inv @ t)[..., 0]
    return make(R=R_inv, t=t_inv)


def compose_pair(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b o pose_a(x)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make(R=R_new, t=t_new)


def compose(pose_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """pose_new(x) = poseN o ... o pose2 o pose1(x)."""
    pose_new = pose_list[0]
    for pose in pose_list[1:]:
        pose_new = compose_pair(pose_new, pose)
    return pose_new


def pad(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] with homogeneous bottom row."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), pose[..., :1, :4].shape
    )
    return jnp.concatenate([pose[..., :3, :4], bottom], axis=-2)


def unpad(pose44: jnp.ndarray) -> jnp.ndarray:
    return pose44[..., :3, :4]


def invert_4x4(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert a [..., 4, 4] rigid transform via the transpose trick."""
    R, t = mat[..., :3, :3], mat[..., :3, 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -R_inv @ t
    top = jnp.concatenate([R_inv, t_inv], axis=-1)
    return pad(top)


def to_hom(X: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis."""
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Transform world points by w2c pose. X: [..., N, 3], pose: [..., 3, 4]."""
    return to_hom(X) @ jnp.swapaxes(pose, -2, -1)


def cam2world(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Transform camera-frame points to world by inverting the w2c pose."""
    return to_hom(X) @ jnp.swapaxes(invert(pose), -2, -1)


def cam2img(X: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    return X @ jnp.swapaxes(K, -2, -1)


def img2cam(X: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    return X @ jnp.swapaxes(jnp.linalg.inv(K), -2, -1)


def angle_to_rotation_matrix(a: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Rotation matrix from Euler angle around an axis (reference `lib/camera.py:263-272`)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), zeros], axis=-1),
            jnp.stack([jnp.sin(a), jnp.cos(a), zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return jnp.roll(M, shift=(roll, roll), axis=(-2, -1))
