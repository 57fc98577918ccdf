"""Free-space skipping: coarse occupancy mask + static-shape sample compaction.

TPU-native rebuild of the reference mask-cache machinery:
* `MaskCache` — boolean "known free space" cache thresholding a frozen SDF
  grid (`lib/voxurf_coarse.py:1271-1292`);
* `MaskGrid` + the CUDA `maskcache_lookup` nearest-voxel query
  (`lib/grid.py:212-245`, `lib/cuda/render_utils_kernel.cu:374-424`);
* the ragged CUDA sampler dropping out-of-mask samples
  (`sample_pts_on_rays`, `render_utils_kernel.cu:196-242`) and the
  train-ray prefilter `get_training_rays_in_maskcache_sampling`
  (`lib/voxurf_coarse.py:1591-1631`).

Design deltas (TPU-first): XLA wants static shapes, so "skip" becomes
**compaction to a fixed budget**: per ray, a stable argsort over the boolean
keep-flags moves the (order-preserving) in-mask samples to the front, and the
first ``K`` lanes are gathered into dense ``[n_rays, K]`` tensors. All
downstream per-sample work (deform MLP, trilerp, color MLP) then costs K
instead of S lanes. Samples beyond K are dropped — the same truncation the
CUDA transmittance scan applies at T < 1e-3, here applied from the front of
known-empty space. With ``K == S`` compaction is exactly equivalent to
masked-dense rendering (parity-tested).

The occupancy mask itself is rebuilt periodically from the *current* raw SDF
grid (dilated min-pool, threshold in world SDF units) — adaptive, unlike the
reference's frozen coarse-stage cache, because the probe object is sculpted
from a cube during the run.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompactSamples(NamedTuple):
    pts: jnp.ndarray    # [N, K, 3]
    step: jnp.ndarray   # [N, K]
    mask: jnp.ndarray   # [N, K] bool — valid AND in-mask
    index: jnp.ndarray  # [N, K] original sample index (diagnostics/tests)


def build_mask_grid(sdf_grid: jnp.ndarray, thres: float, dilate: int = 3) -> jnp.ndarray:
    """Boolean occupancy [X, Y, Z] from a raw SDF grid: ``min-pool(sdf) < thres``.

    The min-pool (window ``dilate``³) makes the mask conservative: a voxel is
    kept when any neighbor is within ``thres`` of the surface/interior, which
    also absorbs small deformation-field offsets. Mirrors the reference's
    max-pool dilation of density occupancy (`lib/grid.py:218`) in SDF sign
    convention (occupied = sdf below threshold, `voxurf_coarse.py:1292`).
    """
    sdf = sdf_grid[0] if sdf_grid.ndim == 4 else sdf_grid  # [X, Y, Z]
    if dilate > 1:
        sdf = jax.lax.reduce_window(
            sdf, jnp.asarray(jnp.inf, sdf.dtype), jax.lax.min,
            window_dimensions=(dilate,) * 3, window_strides=(1,) * 3,
            padding="SAME")
    return jax.lax.stop_gradient(sdf < thres)


def build_mask_grid_mapped(mapped_grid: jnp.ndarray, s_val: float,
                           sigma: float = 3.0, dilate: int = 3,
                           min_frac: float = 0.02,
                           prev: jnp.ndarray | None = None) -> jnp.ndarray:
    """Occupancy from the MAPPED SDF, thresholded in the current NeuS regime.

    ``min-pool(mapped_sdf) < sigma * s_val``: a voxel is kept when its mapped
    SDF is within ``sigma`` sigmoid widths of the surface at the CURRENT
    sharpness (`neus_alpha_from_sdf` uses sigmoid scale ``1/s_val``; samples
    with mapped sdf >> s_val contribute ~zero alpha, so only provably-dead
    space is skipped).

    Why not the raw grid + fixed threshold (`build_mask_grid`): during the
    object phase the learned alpha/beta mapping and the raw grid's scale
    drift freely — a fixed raw-units threshold changes meaning under them.
    Measured failure (queue35 bisect, logs/run_journal/README_r3.md): on a
    sphere probe the raw-threshold mask ratchets shut — carving pushes voxels
    past the threshold, the next rebuild excludes them, excluded voxels never
    receive gradients again — draining the grid to all-positive (empty
    object) while the identical run without the mask reaches psnr_obj 35.
    Thresholding in mapped units at ``sigma * s_val`` is self-stabilizing:
    when the mapping flattens (healthy early dynamics collapse beta, mapped
    amplitude << s_val) the mask relaxes to everything, and it only tightens
    once the SDF is sharp relative to the rendering sigmoid — exactly when
    free-space skipping is trustworthy.

    ``min_frac``: never-strangle floor. If the rebuilt mask would keep less
    than this fraction of voxels (a draining/degenerate grid), fall back to
    ``prev`` (or all-True) instead of locking the object out entirely.
    """
    sdf = mapped_grid[0] if mapped_grid.ndim == 4 else mapped_grid
    if dilate > 1:
        sdf = jax.lax.reduce_window(
            sdf, jnp.asarray(jnp.inf, sdf.dtype), jax.lax.min,
            window_dimensions=(dilate,) * 3, window_strides=(1,) * 3,
            padding="SAME")
    mask = jax.lax.stop_gradient(sdf < sigma * s_val)
    # host-side guard: rebuilds happen in host event code, so a concrete
    # fraction check is fine (and keeps the jitted train step mask-shape-free)
    import numpy as np
    frac = float(np.asarray(mask.mean()))
    if frac < min_frac:
        return prev if prev is not None else jnp.ones_like(mask)
    return mask


def max_inbbox_lanes(poses_w2c, Ks, H: int, W: int, xyz_min, xyz_max,
                     steplen: float, margin: int = 6) -> int:
    """Tight per-ray sample budget: max in-bbox sample count over every pixel
    ray of the given views, plus a pose-drift margin (host numpy, one-time).

    With an all-True occupancy mask and ``K >= max_inbbox_lanes``, the static-K
    compaction keeps EVERY in-bbox sample of every ray — content-identical to
    the dense path (parity-tested) — while cutting the lanes the worst-case
    bbox-diagonal budget wastes (measured 38% on the synthetic protocol:
    47 actual vs 76 budget). This is the safe plastic-phase perf lever: the
    geometry-dependent occupancy masks ratchet/truncate in-flux geometry
    (logs/run_journal/README_r3.md queues 35-36), a chord bound cannot.
    """
    import numpy as np

    lo = np.asarray(xyz_min, np.float64)
    hi = np.asarray(xyz_max, np.float64)
    poses_w2c = np.asarray(poses_w2c, np.float64)
    Ks = np.asarray(Ks, np.float64)
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([u.ravel(), v.ravel(), np.ones(H * W)], -1)
    max_n = 0
    for w2c, K in zip(poses_w2c, Ks):
        R, t = w2c[:3, :3], w2c[:3, 3]
        o = -R.T @ t
        d = pix @ np.linalg.inv(K).T @ R
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (lo - o) / d
            t1 = (hi - o) / d
        tmin = np.nanmax(np.minimum(t0, t1), axis=1)
        tmax = np.nanmin(np.maximum(t0, t1), axis=1)
        chord = np.clip(tmax - np.maximum(tmin, 0.0), 0.0, None)
        n_in = np.ceil(chord * np.linalg.norm(d, axis=1) / steplen)
        max_n = max(max_n, int(np.nanmax(n_in)))
    return max_n + margin


def mask_lookup(mask: jnp.ndarray, xyz: jnp.ndarray, xyz_min, xyz_max) -> jnp.ndarray:
    """Nearest-voxel occupancy at world points (CUDA `maskcache_lookup` parity).

    mask: bool [X, Y, Z]; xyz: [..., 3]. Out-of-bounds points read the clamped
    border voxel (callers AND with their own in-bbox mask anyway).
    """
    shape = mask.shape
    scale = (jnp.asarray(shape, jnp.float32) - 1.0) / (jnp.asarray(xyz_max) - jnp.asarray(xyz_min))
    ijk = (xyz - jnp.asarray(xyz_min)) * scale
    ijk = jnp.rint(ijk).astype(jnp.int32)
    i = jnp.clip(ijk[..., 0], 0, shape[0] - 1)
    j = jnp.clip(ijk[..., 1], 0, shape[1] - 1)
    k = jnp.clip(ijk[..., 2], 0, shape[2] - 1)
    return mask[i, j, k]


def compact_ray_samples(pts: jnp.ndarray, step: jnp.ndarray, keep: jnp.ndarray,
                        K: int) -> CompactSamples:
    """Gather the first K in-mask samples of each ray into dense [N, K] arrays.

    keep: [N, S] bool. A stable argsort over ``~keep`` is an order-preserving
    partition (False sorts first), so the kept lanes stay depth-sorted and the
    exclusive-cumprod transmittance over them equals the masked-dense scan.
    """
    order = jnp.argsort(~keep, axis=1, stable=True)[:, :K]       # [N, K]
    kept = jnp.take_along_axis(keep, order, axis=1)
    return CompactSamples(
        pts=jnp.take_along_axis(pts, order[..., None], axis=1),
        step=jnp.take_along_axis(step, order, axis=1),
        mask=kept,
        index=order,
    )
