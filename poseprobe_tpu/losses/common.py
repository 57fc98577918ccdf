"""Shared loss primitives (diff losses, weighting)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def huber(diff: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber of diff vs zero (torch F.huber_loss semantics)."""
    a = jnp.abs(diff)
    return jnp.where(a <= delta, 0.5 * diff**2, delta * (a - 0.5 * delta))


def compute_diff_loss(loss_type: str, diff: jnp.ndarray, weights=None, mask=None,
                      delta: float = 1.0, dim: int = -1) -> jnp.ndarray:
    """Weighted/masked reduction over a difference tensor.

    Mirrors `compute_diff_loss` (`lib/losses.py:77-103`): masked mean when a
    mask is given, plain mean otherwise.
    """
    lt = loss_type.lower()
    if lt == "epe":
        loss = jnp.linalg.norm(diff, axis=dim, keepdims=True)
    elif lt == "l1":
        loss = jnp.abs(diff)
    elif lt == "mse":
        loss = diff**2
    elif lt == "huber":
        loss = huber(diff, delta)
    else:
        raise ValueError(loss_type)
    if weights is not None:
        loss = loss * weights
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
        return loss.sum() / (mask.astype(loss.dtype).sum() + 1e-6)
    return loss.sum() / (loss.size + 1e-6)


def summarize_losses(loss_dict: dict, loss_weight: dict, parametrization: str = "exp") -> jnp.ndarray:
    """Sum of 10^w * loss (SPARF log-scale weights, `base_losses.py:111-135`)."""
    total = 0.0
    for key, value in loss_dict.items():
        w = loss_weight.get(key)
        if w is None:
            continue
        total = total + (10.0 ** float(w) if parametrization == "exp" else float(w)) * value
    return total


def summarize_losses_equalized(loss_dict: dict) -> jnp.ndarray:
    """Loss equalization: every term rescaled to the render loss's magnitude
    (`summarize_loss_w_equal_weights`, `base_losses.py:82-109`)."""
    render = jax.lax.stop_gradient(loss_dict["render"])
    total = 0.0
    for key, value in loss_dict.items():
        w = jnp.where(jnp.abs(jax.lax.stop_gradient(value)) > 0,
                      render / (jax.lax.stop_gradient(value) + 1e-6), 1.0)
        total = total + w * value
    return total


def mse2psnr(mse) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
