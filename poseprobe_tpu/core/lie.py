"""SO(3)/SE(3) Lie-group math for camera pose refinement.

Semantics match the reference PoseProbe pose layer (`lib/camera.py:105-188`):
exp/log maps use truncated Taylor series for the sin(x)/x-style coefficients so
they are smooth (and differentiable) through theta = 0, which matters because
the learned `se3_refine` parameters start at exactly zero.

Everything here is pure jax.numpy, shape-polymorphic over leading batch dims,
and safe under jit/vmap/grad to arbitrary order.
"""
from __future__ import annotations

import jax.numpy as jnp

_TAYLOR_TERMS = 10


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def taylor_A(x: jnp.ndarray, nth: int = _TAYLOR_TERMS) -> jnp.ndarray:
    """Taylor expansion of sin(x)/x (matches reference `lib/camera.py:165-172`)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def taylor_B(x: jnp.ndarray, nth: int = _TAYLOR_TERMS) -> jnp.ndarray:
    """Taylor expansion of (1-cos(x))/x^2."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def taylor_C(x: jnp.ndarray, nth: int = _TAYLOR_TERMS) -> jnp.ndarray:
    """Taylor expansion of (x-sin(x))/x^3."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_sq(x_sq: jnp.ndarray, kind: str, nth: int = _TAYLOR_TERMS) -> jnp.ndarray:
    """Taylor A/B/C evaluated from theta^2 (even series -> no sqrt needed).

    Avoiding the sqrt matters: `se3_refine` parameters start at exactly zero
    and d|w|/dw is undefined there, which would poison pose gradients.
    """
    ans = jnp.zeros_like(x_sq)
    denom = 1.0
    for i in range(nth + 1):
        if kind == "A":
            if i > 0:
                denom *= (2 * i) * (2 * i + 1)
        elif kind == "B":
            denom *= (2 * i + 1) * (2 * i + 2)
        else:  # "C"
            denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x_sq**i / denom
    return ans


def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3). [..., 3] -> [..., 3, 3]."""
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    A = _taylor_sq(theta_sq, "A")
    B = _taylor_sq(theta_sq, "B")
    return eye + A * wx + B * (wx @ wx)


def SO3_to_so3(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Log map SO(3) -> so(3). [..., 3, 3] -> [..., 3].

    Mirrors the reference (`lib/camera.py:119-125`) incl. the mod-pi guard.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
    theta = jnp.mod(theta, jnp.pi)[..., None, None]
    lnR = 1.0 / (2.0 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3). [..., 6] -> [..., 3, 4]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_sq(theta_sq, "A")
    B = _taylor_sq(theta_sq, "B")
    C = _taylor_sq(theta_sq, "C")
    R = eye + A * wx + B * (wx @ wx)
    V = eye + B * wx + C * (wx @ wx)
    t = V @ u[..., None]
    return jnp.concatenate([R, t], axis=-1)


def SE3_to_se3(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Log map SE(3) -> se(3). [..., 3, 4] -> [..., 6]."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    invV = eye - 0.5 * wx + (1.0 - A / (2.0 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# --- quaternions (reference `lib/camera.py:190-239`) ---

def quat_to_R(q: jnp.ndarray) -> jnp.ndarray:
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], -1),
            jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)], -1),
            jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)], -1),
        ],
        axis=-2,
    )


def R_to_quat(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    r = jnp.sqrt(jnp.clip(1 + t + eps, a_min=0))
    qa = 0.5 * r
    qb = jnp.sign(R21 - R12) * 0.5 * jnp.sqrt(jnp.clip(1 + R00 - R11 - R22 + eps, a_min=0))
    qc = jnp.sign(R02 - R20) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 + R11 - R22 + eps, a_min=0))
    qd = jnp.sign(R10 - R01) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 - R11 + R22 + eps, a_min=0))
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic angle between rotations (radians). Reference `lib/camera.py:345-350`."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
