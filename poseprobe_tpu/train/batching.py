"""Device-side ray/pixel batch sampling (inside jit, fixed shapes).

Replaces the reference's host-side ray gathering:
* object branch semantic sampler — 20/30/50% background/boundary/object pixel
  classes (`get_rays_of_a_view_semantic`, `lib/voxurf_coarse.py:1410-1453`),
  resampled every step from padded per-view pixel pools;
* scene branch `RaySamplingStrategy` — shared random pixel set across views
  with depth-regularization patch expansion
  (`core/sampling_strategies.py:132-188`).

Sampling happens on-device from the current (traced) pose estimates, so the
whole train step stays one XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import pose as pose_ops

SEMANTIC_FRACS = (0.2, 0.3, 0.5)  # background / boundary / object (ref :1413)


class ObjectBatch(NamedTuple):
    rays_o: jnp.ndarray    # [N, 3]
    rays_d: jnp.ndarray    # [N, 3] (unnormalized, like the semantic gather)
    viewdirs: jnp.ndarray  # [N, 3]
    target: jnp.ndarray    # [N, 3]
    mask: jnp.ndarray      # [N, 1]
    view_idx: jnp.ndarray  # [N]


def rays_from_pixels_object(pixels, view_idx, Ks, current_pose, inverse_y: bool):
    """Object-branch rays at (x, y) pixel coords (+0.5 centers) per view index."""
    K = Ks[view_idx]                                       # [N, 3, 3]
    c2w = pose_ops.invert(current_pose)[view_idx]          # [N, 3, 4]
    x = pixels[:, 0].astype(jnp.float32) + 0.5
    y = pixels[:, 1].astype(jnp.float32) + 0.5
    if inverse_y:
        dirs = jnp.stack([(x - K[:, 0, 2]) / K[:, 0, 0], (y - K[:, 1, 2]) / K[:, 1, 1],
                          jnp.ones_like(x)], -1)
    else:
        dirs = jnp.stack([(x - K[:, 0, 2]) / K[:, 0, 0], -(y - K[:, 1, 2]) / K[:, 1, 1],
                          -jnp.ones_like(x)], -1)
    rays_d = jnp.einsum("nc,nrc->nr", dirs, c2w[:, :3, :3])
    rays_o = c2w[:, :3, 3]
    viewdirs = rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    return rays_o, rays_d, viewdirs


def sample_object_batch(
    rng: jax.Array,
    n_rand: int,
    n_active,                 # traced scalar: active view count
    images: jnp.ndarray,      # [n_train, H, W, 3]
    masks: jnp.ndarray,       # [n_train, H, W, 1]
    Ks: jnp.ndarray,          # [n_train, 3, 3]
    current_pose: jnp.ndarray,  # [n_train, 3, 4]
    sampler_pixels: jnp.ndarray,  # [n_train, 3, max_pix, 2]
    sampler_counts: jnp.ndarray,  # [n_train, 3]
    inverse_y: bool,
) -> ObjectBatch:
    k_view, k_class, k_pix = jax.random.split(rng, 3)
    view = jax.random.randint(k_view, (n_rand,), 0, n_active)
    cls = jax.random.choice(k_class, 3, (n_rand,), p=jnp.asarray(SEMANTIC_FRACS))
    count = sampler_counts[view, cls]
    pick = (jax.random.uniform(k_pix, (n_rand,)) * count).astype(jnp.int32)
    pixels = sampler_pixels[view, cls, pick]  # [N, 2] (x, y)
    rays_o, rays_d, viewdirs = rays_from_pixels_object(pixels, view, Ks, current_pose, inverse_y)
    target = images[view, pixels[:, 1], pixels[:, 0]]
    mask = masks[view, pixels[:, 1], pixels[:, 0]]
    return ObjectBatch(rays_o, rays_d, viewdirs, target, mask, view)


class SceneBatch(NamedTuple):
    pixels: jnp.ndarray    # [P, 2] float pixel coords shared across views
    target: jnp.ndarray    # [B, P, 3] per-view rgb at those pixels
    active: jnp.ndarray    # [B] 1.0 where the view participates in the loss


def sample_scene_pixels(
    rng: jax.Array,
    n_views: int,
    rays_per_view: int,
    H: int,
    W: int,
    patch_size: int,
    images: jnp.ndarray,    # [n_train, H, W, 3]
    n_active,
    precrop: bool = False,
    precrop_frac: float = 0.5,
) -> SceneBatch:
    """Shared pixel set (with patch expansion) rendered by every view.

    The reference samples `rand_rays // B` pixels once and renders them for
    all B images (`sampling_strategies.py:132-188` + `renderer.py:559-573`).
    Inactive views keep rendering (constant shapes) but are masked in losses.
    """
    n_patches = rays_per_view // (patch_size**2)
    if precrop:
        dH, dW = int(H // 2 * precrop_frac), int(W // 2 * precrop_frac)
        y0, x0 = H // 2 - dH, W // 2 - dW
        ymax, xmax = max(2 * dH - patch_size, 1), max(2 * dW - patch_size, 1)
    else:
        y0, x0 = 0, 0
        ymax, xmax = max(H - patch_size - 1, 1), max(W - patch_size - 1, 1)
    kx, ky = jax.random.split(rng)
    px = x0 + jax.random.randint(kx, (n_patches,), 0, xmax)
    py = y0 + jax.random.randint(ky, (n_patches,), 0, ymax)
    dx = jnp.arange(patch_size)
    DX, DY = jnp.meshgrid(dx, dx, indexing="xy")
    xs = (px[:, None] + DX.reshape(-1)[None]).reshape(-1)
    ys = (py[:, None] + DY.reshape(-1)[None]).reshape(-1)
    pixels = jnp.stack([xs, ys], -1).astype(jnp.float32)  # [P, 2]
    target = images[:, ys, xs]  # [n_train, P, 3]
    active = (jnp.arange(n_views) < n_active).astype(jnp.float32)
    return SceneBatch(pixels=pixels, target=target, active=active)
