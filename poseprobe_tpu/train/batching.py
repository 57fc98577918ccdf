"""Device-side ray/pixel batch sampling (inside jit, fixed shapes).

Replaces the reference's host-side ray gathering:
* object branch semantic sampler — 20/30/50% background/boundary/object pixel
  classes (`get_rays_of_a_view_semantic`, `lib/voxurf_coarse.py:1410-1453`),
  resampled every step from padded per-view pixel pools;
* scene branch `RaySamplingStrategy` — shared random pixel set across views
  with depth-regularization patch expansion, optional dilated-foreground-mask
  fraction (per view) and center-box fraction
  (`core/sampling_strategies.py:36-188`).

Sampling happens on-device from the current (traced) pose estimates, so the
whole train step stays one XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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
    pixels: jnp.ndarray    # [B, P, 2] float pixel coords (per view)
    target: jnp.ndarray    # [B, P, 3] per-view rgb at those pixels
    active: jnp.ndarray    # [B] 1.0 where the view participates in the loss


def dilate_fg_mask_pools(masks: np.ndarray, patch_size: int, dilation: int = 10):
    """Per-view pixel pools inside the 10×(3×3)-dilated foreground mask.

    Host-side preprocessing mirroring `samples_in_mask`
    (`sampling_strategies.py:57-89`): dilate each mask, exclude the last
    ``patch_size + 1`` rows/cols (patch expansion bound), then pad the (x, y)
    index lists to a common length. Returns (pools [B, max_n, 2] int32,
    counts [B] int32).
    """
    m = np.asarray(masks)
    if m.ndim == 4:
        m = m[..., 0]
    m = m > 0.5
    B, H, W = m.shape
    d = m.copy()
    for _ in range(dilation):
        grown = d.copy()
        grown[:, 1:, :] |= d[:, :-1, :]
        grown[:, :-1, :] |= d[:, 1:, :]
        grown[:, :, 1:] |= d[:, :, :-1]
        grown[:, :, :-1] |= d[:, :, 1:]
        # diagonal neighbors (3x3 structuring element)
        grown[:, 1:, 1:] |= d[:, :-1, :-1]
        grown[:, 1:, :-1] |= d[:, :-1, 1:]
        grown[:, :-1, 1:] |= d[:, 1:, :-1]
        grown[:, :-1, :-1] |= d[:, 1:, 1:]
        d = grown
    d[:, H - patch_size - 1:, :] = False
    d[:, :, W - patch_size - 1:] = False
    pools, counts = [], []
    for b in range(B):
        ys, xs = np.where(d[b])
        pools.append(np.stack([xs, ys], -1).astype(np.int32))
        counts.append(len(xs))
    max_n = max(max(counts), 1)
    padded = np.zeros((B, max_n, 2), np.int32)
    for b in range(B):
        if counts[b] > 0:
            padded[b, :counts[b]] = pools[b]
    return padded, np.asarray(counts, np.int32)


def _expand_patches(px: jnp.ndarray, py: jnp.ndarray, patch_size: int):
    """[..., n] patch corners -> [..., n*patch_size**2] pixel coords."""
    dx = jnp.arange(patch_size)
    DX, DY = jnp.meshgrid(dx, dx, indexing="xy")
    xs = (px[..., None] + DX.reshape(-1)).reshape(*px.shape[:-1], -1)
    ys = (py[..., None] + DY.reshape(-1)).reshape(*py.shape[:-1], -1)
    return xs, ys


def sample_scene_pixels(
    rng: jax.Array,
    n_views: int,
    rays_per_view: int,
    H: int,
    W: int,
    patch_size: int,
    images: jnp.ndarray,    # [n_views, H, W, 3]
    n_active,
    precrop: bool = False,
    precrop_frac: float = 0.5,
    center_fraction: float = 0.0,
    fg_pixels: jnp.ndarray | None = None,  # [n_views, max_n, 2] padded pools
    fg_counts: jnp.ndarray | None = None,  # [n_views]
    n_fg_patches: int = 0,
) -> SceneBatch:
    """Pixel set (with patch expansion) rendered by every view.

    Mirrors `RaySamplingStrategy.__call__` (`sampling_strategies.py:132-188`):
    * a shared random patch set across views (optionally from the center
      pre-crop box during warm-up, `sample_in_center`),
    * plus `sampled_fraction_in_center` of the patches drawn from the center
      box (shared), or `sample_fraction_in_fg_mask` of the patches drawn
      per-view from the dilated foreground-mask pools (these differ by view,
      hence the [B, P, 2] pixel layout).
    Inactive views keep rendering (constant shapes) but are masked in losses.
    """
    n_patches = max(rays_per_view // (patch_size**2), 1)
    n_fg = min(int(n_fg_patches), n_patches) if fg_pixels is not None else 0
    n_center = int(n_patches * center_fraction) if (center_fraction > 0 and n_fg == 0) else 0
    n_rand = n_patches - n_fg - n_center

    if precrop:
        dH, dW = int(H // 2 * precrop_frac), int(W // 2 * precrop_frac)
        y0, x0 = H // 2 - dH, W // 2 - dW
        ymax, xmax = max(2 * dH - patch_size, 1), max(2 * dW - patch_size, 1)
    else:
        y0, x0 = 0, 0
        ymax, xmax = max(H - patch_size - 1, 1), max(W - patch_size - 1, 1)
    kx, ky, kc, kf = jax.random.split(rng, 4)
    px = x0 + jax.random.randint(kx, (n_rand,), 0, xmax)
    py = y0 + jax.random.randint(ky, (n_rand,), 0, ymax)

    if n_center > 0:
        dH, dW = int(H // 2 * precrop_frac), int(W // 2 * precrop_frac)
        cy0, cx0 = H // 2 - dH, W // 2 - dW
        cymax, cxmax = max(2 * dH - patch_size, 1), max(2 * dW - patch_size, 1)
        kcx, kcy = jax.random.split(kc)
        px = jnp.concatenate([px, cx0 + jax.random.randint(kcx, (n_center,), 0, cxmax)])
        py = jnp.concatenate([py, cy0 + jax.random.randint(kcy, (n_center,), 0, cymax)])

    # shared part, broadcast over views
    px_b = jnp.broadcast_to(px, (n_views, n_rand + n_center))
    py_b = jnp.broadcast_to(py, (n_views, n_rand + n_center))

    if n_fg > 0:
        u = jax.random.uniform(kf, (n_views, n_fg))
        counts = jnp.maximum(fg_counts[:n_views], 1)
        pick = (u * counts[:, None]).astype(jnp.int32)
        sel = jnp.take_along_axis(fg_pixels[:n_views], pick[..., None], axis=1)  # [B, n_fg, 2]
        px_b = jnp.concatenate([px_b, sel[..., 0]], axis=1)
        py_b = jnp.concatenate([py_b, sel[..., 1]], axis=1)

    xs, ys = _expand_patches(px_b, py_b, patch_size)   # [B, P]
    pixels = jnp.stack([xs, ys], -1).astype(jnp.float32)  # [B, P, 2]
    vidx = jnp.arange(n_views)[:, None]
    target = images[vidx, ys, xs]  # [B, P, 3]
    active = (jnp.arange(n_views) < n_active).astype(jnp.float32)
    return SceneBatch(pixels=pixels, target=target, active=active)
