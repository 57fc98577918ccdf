"""Fixed-shape ray sampling: ray-AABB intersection + dense stepping with masks.

TPU-native replacement for both reference samplers:
* `sample_ray_ori` (pure-torch fixed N_samples, `lib/voxurf_coarse.py:697-719`)
  — reproduced exactly.
* The CUDA ragged sampler `sample_pts_on_rays`
  (`lib/cuda/render_utils_kernel.cu:196-242`) — its variable-length
  `(ray_id, step_id)` layout is replaced by dense [n_rays, n_samples] arrays
  plus a validity mask; XLA prefers static shapes and masked math over
  gather/scatter compaction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RaySamples(NamedTuple):
    pts: jnp.ndarray        # [N_rays, N_samples, 3] world-space sample points
    mask_inbbox: jnp.ndarray  # [N_rays, N_samples] bool, True = inside AABB
    step: jnp.ndarray       # [N_rays, N_samples] distance along ray from t_min (world units)
    t_min: jnp.ndarray      # [N_rays]
    t_max: jnp.ndarray      # [N_rays]


def n_samples_for_grid(world_size, stepsize: float) -> int:
    """Max sample count covering the grid diagonal (reference `sample_ray_ori` step 1)."""
    ws = np.asarray(world_size, dtype=np.float64)
    return int(np.linalg.norm(ws + 1) / stepsize) + 1


def ray_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray,
             near: float, far: float):
    """Slab-method ray/AABB entry+exit distances, clamped to [near, far].

    Mirrors reference `sample_ray_ori` steps 2-3 (incl. its t parameterization
    in units of the *unnormalized* direction). Returns (t_min, t_max, miss).
    """
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = jnp.clip(jnp.maximum(rate_a, rate_b).min(-1), near, far)
    return t_min, t_max, t_max <= t_min


def sample_ray(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    far: float,
    stepsize: float,
    voxel_size: jnp.ndarray,
    n_samples: int,
    rng: jax.Array | None = None,
) -> RaySamples:
    """Sample `n_samples` points per ray starting at the AABB entry point.

    rays_o/rays_d: [N, 3] (rays_d need not be unit norm; steps are world-metric
    via `step / |rays_d|`, exactly like the reference).
    With `rng`, a per-ray uniform jitter is added (training-time stratification).
    """
    t_min, t_max, miss = ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far)
    n_rays = rays_o.shape[0]
    rng_steps = jnp.broadcast_to(jnp.arange(n_samples, dtype=rays_o.dtype), (n_rays, n_samples))
    if rng is not None:
        rng_steps = rng_steps + jax.random.uniform(rng, (n_rays, 1), dtype=rays_o.dtype)
    step = stepsize * voxel_size * rng_steps  # world-metric distance from entry
    # guard: padded/masked lanes may carry zero directions; keep them finite
    d_norm = jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    interpx = t_min[..., None] + step / d_norm
    pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
    inbbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1) & (~miss)[..., None]
    return RaySamples(pts=pts, mask_inbbox=inbbox, step=step, t_min=t_min, t_max=t_max)


def sample_depth_stratified(rng: jax.Array | None, batch_size: int, num_rays: int, n_samples: int,
                            depth_min, depth_max, param: str = "metric") -> jnp.ndarray:
    """Scene-branch depth sampling (reference `Graph.sample_depth`, `renderer.py:665-701`).

    Returns [B, num_rays, n_samples, 1]. `param='inverse'` returns 1/d samples.
    """
    if rng is not None:
        rand = jax.random.uniform(rng, (batch_size, num_rays, n_samples, 1))
    else:
        rand = 0.5 * jnp.ones((batch_size, num_rays, n_samples, 1))
    rand = rand + jnp.arange(n_samples, dtype=jnp.float32)[None, None, :, None]
    depth = rand / n_samples * (depth_max - depth_min) + depth_min
    if param == "inverse":
        depth = 1.0 / (depth + 1e-8)
    return depth


def merge_sorted_depths(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact merge of two per-ray ascending depth sets [..., Sa, 1], [..., Sb, 1].

    Replaces `jnp.sort(concat(a, b))` (a 2S-wide bitonic sort per ray) with
    rank arithmetic: each element's output position is its own index plus the
    count of elements from the other array ahead of it. Ties break a-first
    (strict < for a vs <= for b), so the position map is a permutation.
    """
    av, bv = a[..., 0], b[..., 0]
    Sa, Sb = av.shape[-1], bv.shape[-1]
    pos_a = jnp.arange(Sa) + (bv[..., None, :] < av[..., :, None]).sum(axis=-1)
    pos_b = jnp.arange(Sb) + (av[..., None, :] <= bv[..., :, None]).sum(axis=-1)
    vals = jnp.concatenate([av, bv], axis=-1)
    pos = jnp.concatenate([pos_a, pos_b], axis=-1)
    # Apply the permutation as a one-hot multiply-reduce instead of
    # put_along_axis: the scatter lowers to a ~1.8 ms/step kernel on TPU,
    # while this fuses into one VPU pass (pos is a permutation, so each
    # output slot receives exactly one value).
    k = jnp.arange(Sa + Sb)
    out = jnp.sum(jnp.where(pos[..., :, None] == k, vals[..., :, None], 0.0),
                  axis=-2)
    return out[..., None]


def sample_depth_to_max(batch_size: int, num_rays: int, n_samples: int,
                        depth_min, depth_max: jnp.ndarray) -> jnp.ndarray:
    """Depth samples with a per-ray max (visibility rendering).

    Mirrors `sample_depth_diff_max_range_per_ray` (`renderer.py:880-909`),
    including its rand=1 offset quirk. depth_max: [B, num_rays].
    """
    rand = jnp.ones((batch_size, num_rays, n_samples, 1))
    rand = rand + jnp.arange(n_samples, dtype=jnp.float32)[None, None, :, None]
    return rand / n_samples * (depth_max[..., None, None] - depth_min) + depth_min


def sample_depth_from_pdf(rng: jax.Array | None, weights: jnp.ndarray, n_samples_coarse: int,
                          n_samples_fine: int, depth_min, depth_max) -> jnp.ndarray:
    """Hierarchical inverse-CDF resampling (reference `sample_depth_from_pdf`,
    `renderer.py:703-738`). weights: [B, R, N]. Returns [B, R, Nf, 1].
    """
    pdf = weights / (weights.sum(axis=-1, keepdims=True) + 1e-6)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, R, N+1]
    if rng is None:
        grid = jnp.linspace(0.0, 1.0, n_samples_fine + 1)
    else:
        # sorted uniforms: same sample set per ray (the grid is shared across
        # rays), but the inverse-CDF output becomes depth-sorted, which lets
        # the fine pass MERGE with the (sorted) coarse depths instead of
        # running a full bitonic sort (8.4 ms at bench scale -> ~1 ms)
        grid = jnp.sort(jax.random.uniform(rng, (n_samples_fine + 1,)))
    unif = 0.5 * (grid[:-1] + grid[1:])
    unif = jnp.broadcast_to(unif, cdf.shape[:-1] + (n_samples_fine,))
    # searchsorted(side='right') as a vectorized rank: idx = #(cdf <= u).
    # The per-element binary search (vmapped jnp.searchsorted) lowers to a
    # serial while_loop per lane on TPU and cost ~19 ms/call at bench scale;
    # this O(S·Nf) compare+reduce is a single fused VPU pass (<1 ms).
    le = cdf[..., :, None] <= unif[..., None, :]  # [B, R, N+1, Nf]
    idx = le.sum(axis=-2)
    # Bin endpoints by arithmetic, not gather: depth_bin is a linspace, and a
    # [B*R*Nf]-sized gather from it costs ~1.6 ms/call on TPU (profiled);
    # idx*dd is free. The CDF endpoint gathers (take_along_axis) are likewise
    # replaced with masked max/min reductions over the compare mask already
    # computed for `idx` — cdf is per-ray ascending, so
    # cdf[idx-1] = max{c : c <= u} and cdf[idx] = min{c : c > u} (with the
    # out-of-range clip landing on the same degenerate bin as the gather
    # version: depth_low == depth_high, so `t` cancels).
    dd = (depth_max - depth_min) / n_samples_coarse
    idxf = idx.astype(cdf.dtype)
    depth_low = depth_min + jnp.clip(idxf - 1.0, 0.0, n_samples_coarse) * dd
    depth_high = depth_min + jnp.clip(idxf, 0.0, n_samples_coarse) * dd
    cdf_e = cdf[..., :, None]
    cdf_low = jnp.max(jnp.where(le, cdf_e, 0.0), axis=-2)
    cdf_high = jnp.min(jnp.where(le, 2.0, cdf_e), axis=-2)
    cdf_high = jnp.minimum(cdf_high, cdf[..., -1:])  # idx == N+1: clip to last
    t = (unif - cdf_low) / (cdf_high - cdf_low + 1e-8)
    depth = depth_low + t * (depth_high - depth_low)
    return depth[..., None]
