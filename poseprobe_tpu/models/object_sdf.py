"""Object branch: dense voxel-SDF pose probe with deformation + color head.

TPU-native rebuild of `Voxurf` (`lib/voxurf_coarse.py:45-1263`):

* cube-initialized SDF grid (`:153-170`), feature grid k0 + shallow color MLP
  (`:194-216`), learned ``sdf_alpha/sdf_beta`` mapping
  ``sdf' = softplus(a) * (sigmoid(softplus(b) * sdf) - 0.5)`` (`:746-749`),
* SIREN-style implicit deformation (`lib/deformation/`),
* NeuS alpha compositing with the s-schedule (`:483-519`),
* surface localisation by SDF zero-crossing (`query_sdf_point_wocuda*`,
  `:734-920`) used for PnP anchors and reprojection losses.

Design deltas (TPU-first):
* All state is one params pytree; ``progress``/``s_val`` are traced scalars
  derived from ``global_step`` rather than mutated buffers.
* Rendering works on dense [n_rays, n_samples] tensors with an in-bbox mask;
  no ragged gather/scatter compaction (the CUDA `(ray_id, step_id)` layout).
* Point-wise SDF spatial gradients come from one jax.grad of a sum — exact,
  any order, replacing `torch.autograd.grad(..., create_graph=True)`.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compositing, grid as grid_ops, maskcache, pe, ray_sampling
from . import deform as deform_mod
from .mlp import apply_mlp, init_mlp


def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """Norm with a NaN-free gradient at x = 0 (flat SDF regions produce exactly
    zero spatial gradients; d|x|/dx there would be 0/0)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


@dataclasses.dataclass(frozen=True)
class ObjectConfig:
    """Static configuration (hashable; safe as a jit static arg)."""

    xyz_min: tuple = (-0.6, -0.6, -0.75)
    xyz_max: tuple = (0.6, 0.6, 0.45)
    num_voxels: int = 96**3
    num_voxels_base: int = 96**3
    # color head (configs/dtu_e2e/scan1.py:107-122 + default_fine_s.py:123-143)
    rgbnet_dim: int = 12
    rgbnet_depth: int = 4
    rgbnet_width: int = 128
    rgbnet_direct: bool = True
    posbase_pe: int = 5
    viewbase_pe: int = 1
    geo_rgb_dim: int = 3
    # NeuS s schedule (scan1.py:120-121)
    s_ratio: float = 50.0
    s_start: float = 0.2
    s_learn: bool = False
    step_start: int = 0
    # sampling
    stepsize: float = 1.5
    # feature-grid backend (`create_grid` dispatch, lib/grid.py:27-35): the
    # SDF grid stays dense like the reference Voxurf (`voxurf_coarse.py:121`);
    # k0 may use the VM-decomposed TensoRF grid (`lib/grid.py:95-206`)
    grid_type: str = "dense"          # "dense" | "tensorf"
    tensorf_n_comp: int = 24
    # pose/barf
    barf_c2f: tuple | None = (0.6, 1.0)
    N_iters: int = 10000
    # smoothing conv over the sdf grid before sampling (scan1.py:118 -> off)
    smooth_ksize: int = 0
    smooth_sigma: float = 0.8
    # cap on the learned beta of the sigmoid SDF mapping (0 = off). Healthy
    # object-phase dynamics COLLAPSE map_beta from its init (~2.0) to
    # ~0.002-0.5 within ~800 steps so the raw grid carries the shape;
    # the evaporation basin instead RAISES beta (observed 2.9 -> 5.0 while
    # frac_neg drains to 0): the saturating sigmoid lets the raw grid
    # drift all-positive while still rendering, killing extraction and the
    # PnP anchors. Capping at the init value blocks the basin without
    # touching healthy runs (round-5 journal #13).
    beta_cap: float = 0.0
    # rect used for cube init; None -> derived from bbox like recon_scene.py:142
    world_bound_scale: float = 1.05
    fast_color_thres: float = 0.0
    # fuse alpha+transmittance+composite into the Pallas kernel (TPU only)
    use_pallas_composite: bool = False
    # free-space skipping (ops/maskcache.py): compact each ray's samples to the
    # first maskcache_keep*n_samples lanes inside the occupancy mask
    # (`MaskCache`/`maskcache_lookup`, voxurf_coarse.py:1271-1292,
    # render_utils_kernel.cu:374-424). thres is in raw SDF (world) units.
    use_maskcache: bool = False
    maskcache_thres: float = 0.05   # raw-units variant (build_mask_grid)
    maskcache_sigma: float = 3.0    # mapped-units: keep mapped sdf < sigma*s_val
    maskcache_keep: float = 0.5
    maskcache_dilate: int = 3

    # --- derived (static) ---
    @property
    def xyz_min_np(self):
        return np.asarray(self.xyz_min, np.float32)

    @property
    def xyz_max_np(self):
        return np.asarray(self.xyz_max, np.float32)

    @property
    def voxel_size(self) -> float:
        return float((np.prod(self.xyz_max_np - self.xyz_min_np) / self.num_voxels) ** (1 / 3))

    @property
    def voxel_size_base(self) -> float:
        return float((np.prod(self.xyz_max_np - self.xyz_min_np) / self.num_voxels_base) ** (1 / 3))

    @property
    def world_size(self) -> tuple:
        return tuple(int(v) for v in (self.xyz_max_np - self.xyz_min_np) / self.voxel_size)

    @property
    def n_samples(self) -> int:
        return ray_sampling.n_samples_for_grid(self.world_size, self.stepsize)

    @property
    def maskcache_K(self) -> int:
        """Static per-ray sample budget after free-space compaction."""
        return max(1, int(np.ceil(self.maskcache_keep * self.n_samples)))

    @property
    def rect_size(self) -> np.ndarray:
        # reference: (xyz_max - xyz_min) / (world_bound_scale * 1.05) (recon_scene.py:142)
        return (self.xyz_max_np - self.xyz_min_np) / (self.world_bound_scale * 1.05)

    @property
    def range_shape_max(self) -> float:
        return float(self.rect_size.max())

    @property
    def diagonal_length(self) -> float:
        # NOTE: reproduces the reference formula sqrt(sum(xyz_max - xyz_min**2))
        # (lib/voxurf_coarse.py:102) — an apparent typo kept for parity since it
        # scales the near-surface loss threshold.
        return float(np.sqrt(np.sum(self.xyz_max_np - self.xyz_min_np**2)))

    def rgbnet_in_dim(self) -> int:
        d = 3 + 3 * self.posbase_pe * 2 + 3 + 3 * self.viewbase_pe * 2
        d += self.rgbnet_dim if self.rgbnet_direct else self.rgbnet_dim - 3
        d += self.geo_rgb_dim
        return d


def cube_sdf_init(cfg: ObjectConfig) -> jnp.ndarray:
    """Signed distance to an axis-aligned box, negative inside.

    Mirrors the reference cube_init (`lib/voxurf_coarse.py:153-170`) including
    its mirrored-plane distance formula.
    """
    X, Y, Z = cfg.world_size
    xs = np.linspace(cfg.xyz_min[0], cfg.xyz_max[0], X)
    ys = np.linspace(cfg.xyz_min[1], cfg.xyz_max[1], Y)
    zs = np.linspace(cfg.xyz_min[2], cfg.xyz_max[2], Z)
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    rect = cfg.rect_size
    center = (cfg.xyz_max_np + cfg.xyz_min_np) / 2
    dist_x = np.minimum(np.abs(x - (rect[0] / 2 - center[0])), np.abs(x - (rect[0] / 2 + center[0])))
    dist_y = np.minimum(np.abs(y - (rect[1] / 2 - center[1])), np.abs(y - (rect[1] / 2 + center[1])))
    dist_z = np.minimum(np.abs(z - (rect[2] / 2 - center[2])), np.abs(z - (rect[2] / 2 + center[2])))
    sdf = np.sqrt(dist_x**2 + dist_y**2 + dist_z**2)
    inside = (
        (x >= center[0] - rect[0] / 2) & (x <= center[0] + rect[0] / 2)
        & (y >= center[1] - rect[1] / 2) & (y <= center[1] + rect[1] / 2)
        & (z >= center[2] - rect[2] / 2) & (z <= center[2] + rect[2] / 2)
    )
    sdf[inside] *= -1
    return jnp.asarray(sdf[None], dtype=jnp.float32)  # [1, X, Y, Z]


def init_k0_grid(key, cfg: ObjectConfig):
    """Feature-grid init with backend dispatch (`create_grid`, lib/grid.py:27-35)."""
    if cfg.grid_type == "tensorf":
        from ..ops import tensorf
        return tensorf.init_tensorf_params(key, cfg.rgbnet_dim, cfg.world_size,
                                           cfg.tensorf_n_comp)
    return jnp.zeros((cfg.rgbnet_dim,) + tuple(cfg.world_size), jnp.float32)


def sample_k0(params: dict, cfg: ObjectConfig, pts, lo, hi):
    """k0 feature lookup at world points for either grid backend."""
    if cfg.grid_type == "tensorf":
        from ..ops import tensorf
        return tensorf.tensorf_sample(params["k0_grid"], pts, lo, hi)
    return grid_ops.trilinear_sample(params["k0_grid"], pts, lo, hi)


def init_object_params(key, cfg: ObjectConfig) -> dict:
    k_rgb, k_warp, k_k0 = jax.random.split(key, 3)
    dims = [cfg.rgbnet_in_dim()] + [cfg.rgbnet_width] * (cfg.rgbnet_depth - 1) + [3]
    rgbnet = init_mlp(k_rgb, dims, scheme="torch")
    rgbnet[-1]["b"] = jnp.zeros_like(rgbnet[-1]["b"])  # final bias zero (ref :216)
    return {
        "sdf_grid": cube_sdf_init(cfg),
        "k0_grid": init_k0_grid(k_k0, cfg),
        "rgbnet": rgbnet,
        "warpnet": deform_mod.init_deform_params(k_warp, cfg.range_shape_max),
        "sdf_alpha": jnp.asarray(10.0),
        "sdf_beta": jnp.asarray(2.0),
        "s_val": jnp.asarray(cfg.s_start),
    }


def maskout_near_cam_vox(params: dict, cfg: ObjectConfig, cam_o: np.ndarray, near: float) -> dict:
    """Set SDF=1 (empty) on voxels within `near` of any camera (`voxurf_coarse.py:379-391`)."""
    X, Y, Z = cfg.world_size
    xs = np.linspace(cfg.xyz_min[0], cfg.xyz_max[0], X)
    ys = np.linspace(cfg.xyz_min[1], cfg.xyz_max[1], Y)
    zs = np.linspace(cfg.xyz_min[2], cfg.xyz_max[2], Z)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    grid_xyz = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    d = np.linalg.norm(grid_xyz[:, None, :] - np.asarray(cam_o)[None], axis=-1).min(1)
    sdf = np.asarray(params["sdf_grid"]).reshape(-1)
    sdf = np.where(d <= near, 1.0, sdf).reshape(1, X, Y, Z)
    return {**params, "sdf_grid": jnp.asarray(sdf, jnp.float32)}


def softplus10(x):
    """nn.Softplus(beta=10) as used for sdf_alpha/beta (`voxurf_coarse.py:73`)."""
    return jax.nn.softplus(10.0 * x) / 10.0


def processed_sdf_grid(params: dict, cfg: ObjectConfig) -> jnp.ndarray:
    """Smoothing (optional) + learned mapping to the rendered SDF (`:744-749`)."""
    sdf = params["sdf_grid"]
    if cfg.smooth_ksize > 0:
        # Gaussian is separable: 3 cheap 1-D passes instead of a 3-D conv
        kernel = grid_ops.gaussian_kernel_1d(cfg.smooth_ksize, cfg.smooth_sigma)
        sdf = grid_ops.conv3d_separable_replicate(sdf, kernel)
    alpha = softplus10(params["sdf_alpha"])
    beta = softplus10(params["sdf_beta"])
    if cfg.beta_cap > 0:
        beta = jnp.minimum(beta, cfg.beta_cap)  # blocks the evaporation basin
    return alpha * (jax.nn.sigmoid(beta * sdf) - 0.5)


def _bounds(cfg: ObjectConfig):
    return jnp.asarray(cfg.xyz_min_np), jnp.asarray(cfg.xyz_max_np)


def sdf_with_deform(params: dict, cfg: ObjectConfig, sdf_grid: jnp.ndarray, pts: jnp.ndarray,
                    use_deform: bool):
    """SDF value at world points, optionally through the deformation field.

    Returns (sdf [...], aux dict with deform/correction when use_deform).
    """
    lo, hi = _bounds(cfg)
    if use_deform:
        deform, correction = deform_mod.apply_deform(params["warpnet"], pts)
        new_coords = pts + deform
        sdf = grid_ops.trilinear_sample(sdf_grid, new_coords, lo, hi)[..., 0]
        sdf = sdf + correction[..., 0]
        return sdf, {"deform": deform, "correction": correction}
    sdf = grid_ops.trilinear_sample(sdf_grid, pts, lo, hi)[..., 0]
    return sdf, {}


def _color_head(params: dict, cfg: ObjectConfig, pts, viewdirs, gradient, progress, lo, hi,
                k0=None):
    """Per-sample color: k0 features + BARF-masked pos/view PE + normal -> MLP
    -> sigmoid (`voxurf_coarse.py:1005-1033`).

    `k0` may be pre-sampled by the caller (render merges the sdf + k0 lookups
    at the same points into one 13-channel gather/scatter pair)."""
    rays_xyz = (pts - lo) / (hi - lo)
    xyz_emb = pe.posenc_object(rays_xyz, cfg.posbase_pe, progress, cfg.barf_c2f)
    view_emb = pe.posenc_object(viewdirs, cfg.viewbase_pe, progress, cfg.barf_c2f)
    view_emb = jnp.broadcast_to(view_emb[:, None, :], pts.shape[:2] + (view_emb.shape[-1],))
    if k0 is None:
        k0 = sample_k0(params, cfg, pts, lo, hi)
    feats = [k0, xyz_emb, view_emb]
    if cfg.geo_rgb_dim == 3:
        normal = gradient / (safe_norm(gradient, keepdims=True) + 1e-5)
        feats.append(normal)
    return apply_mlp(params["rgbnet"], jnp.concatenate(feats, -1), final_activation=jax.nn.sigmoid)


def render(
    params: dict,
    cfg: ObjectConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    global_step,
    rng: jax.Array | None = None,
    use_deform: bool = True,
    is_train: bool = True,
    near: float = 0.3,
    far: float = 4.0,
    bg: float = 0.0,
    mask_grid: jnp.ndarray | None = None,
    mask_k: int | None = None,
) -> dict[str, Any]:
    """Train/eval volume render. Mirrors `Voxurf.forward` (`voxurf_coarse.py:922-1092`).

    rays_o/rays_d: [N, 3]; viewdirs unit [N, 3]. `global_step` may be traced.
    Returns per-ray composited quantities plus per-sample diagnostics needed
    by the losses (everything dense [N, S] with `mask` for validity).
    """
    lo, hi = _bounds(cfg)
    n_samples = cfg.n_samples
    progress = jnp.clip(global_step / cfg.N_iters, 0.0, 1.0) if is_train else 1.0

    samp = ray_sampling.sample_ray(
        rays_o, rays_d, lo, hi, near=near, far=far, stepsize=cfg.stepsize,
        voxel_size=jnp.asarray(cfg.voxel_size), n_samples=n_samples,
        rng=rng if is_train else None,
    )
    pts = samp.pts  # [N, S, 3]
    mask = samp.mask_inbbox  # [N, S]
    step = samp.step
    if mask_grid is not None:
        # free-space skipping: keep the first K in-mask samples per ray.
        # mask_k overrides the config budget (the trainer passes the tight
        # per-ray chord bound during the plastic phase, maskcache.max_inbbox_lanes)
        occ = maskcache.mask_lookup(mask_grid, pts, lo, hi)
        comp = maskcache.compact_ray_samples(pts, step, mask & occ,
                                             mask_k or cfg.maskcache_K)
        pts, step, mask = comp.pts, comp.step, comp.mask

    sdf_grid = processed_sdf_grid(params, cfg)

    # SDF value + spatial gradient, all forward-mode/analytic: three JVPs
    # through the deform MLP give the warp Jacobian, the trilerp gradient is
    # closed-form, and the chain rule composes them — so the outer loss
    # backward stays a single first-order VJP (the reference instead builds
    # create_graph=True backward graphs, `voxurf_coarse.py:972-984`).
    # Merged pts-located lookups: the sdf and the 12-ch k0 features are both
    # sampled at `pts`, so for the dense backend they share one 13-channel
    # gather (fwd) and one 13-channel row scatter (bwd) instead of a scalar
    # pair + a 12-ch pair — the scalar scatter alone profiled at 3.4 ms/step
    # (serialization-bound; see ops/pallas/layout.py for the row layout).
    merged = cfg.grid_type == "dense"
    k0_feat = None

    aux = {}
    if use_deform:
        deform, correction, jac_warp, grad_corr = deform_mod.deform_with_jacobian_fwd(
            params["warpnet"], pts)
        new_coords = pts + deform
        sdf_val, tri_grad = grid_ops.trilinear_sample_with_grad(sdf_grid, new_coords, lo, hi)
        sdf_final = sdf_val[..., 0] + correction[..., 0]
        # d sdf/d pts_j = sum_i J_warp[..., j, i] * d trilerp/d x_i + d corr/d pts_j
        gradient = jnp.einsum("...ji,...i->...j", jac_warp, tri_grad[..., 0, :]) + grad_corr
        if merged:
            both = grid_ops.trilinear_sample(
                jnp.concatenate([sdf_grid, params["k0_grid"]], axis=0), pts, lo, hi)
            sdf_wo_deform, k0_feat = both[..., 0], both[..., 1:]
        else:
            sdf_wo_deform = grid_ops.trilinear_sample(sdf_grid, pts, lo, hi)[..., 0]
        aux = {
            "sdf_deform": sdf_final - sdf_wo_deform,  # (ref :978)
            "grad_deform": jac_warp,
            "sdf_correct": correction,
        }
    elif merged:
        both, tri_grad = grid_ops.trilinear_sample_with_grad(
            jnp.concatenate([sdf_grid, params["k0_grid"]], axis=0), pts, lo, hi)
        sdf_final, k0_feat = both[..., 0], both[..., 1:]
        gradient = tri_grad[..., 0, :]
    else:
        sdf_val, tri_grad = grid_ops.trilinear_sample_with_grad(sdf_grid, pts, lo, hi)
        sdf_final = sdf_val[..., 0]
        gradient = tri_grad[..., 0, :]

    dist = cfg.stepsize * cfg.voxel_size
    if is_train and not cfg.s_learn:
        s_val = compositing.s_val_schedule(global_step, cfg.s_ratio, cfg.s_start, cfg.step_start)
    else:
        s_val = params["s_val"]

    if cfg.use_pallas_composite and cfg.fast_color_thres <= 0:
        # fused Pallas path: alpha + transmittance + (rgb, step) sums in one
        # kernel; rgb must be computed first, so gather color features now
        from ..ops.pallas import fused_composite as FC
        true_cos = jnp.sum(viewdirs[:, None, :] * gradient, axis=-1)
        cos_term = -jnp.maximum(-true_cos, 0.0)
        rgb_pre = _color_head(params, cfg, pts, viewdirs, gradient, progress, lo, hi,
                               k0=k0_feat)
        weights, alphainv_last, rgb_marched_raw, n_step_f = FC.fused_alpha_composite(
            sdf_final, cos_term, mask, rgb_pre, step, 1.0 / s_val, dist)
        alpha = compositing.neus_alpha_from_sdf(viewdirs[:, None, :], dist, sdf_final,
                                                gradient, s_val)
        alpha = jnp.where(mask, alpha, 0.0)
        rgb = rgb_pre
    else:
        alpha = compositing.neus_alpha_from_sdf(viewdirs[:, None, :], dist, sdf_final, gradient, s_val)
        alpha = jnp.where(mask, alpha, 0.0)
        weights, alphainv_last = compositing.alpha2weights(alpha)
        if cfg.fast_color_thres > 0:
            keep = weights > cfg.fast_color_thres
            alpha = jnp.where(keep, alpha, 0.0)
            weights, alphainv_last = compositing.alpha2weights(alpha)

    if not (cfg.use_pallas_composite and cfg.fast_color_thres <= 0):
        rgb = _color_head(params, cfg, pts, viewdirs, gradient, progress, lo, hi,
                          k0=k0_feat)

    w = weights[..., None]
    rgb_marched = (w * rgb).sum(axis=1)
    cum_weights = w.sum(axis=1)  # [N, 1]
    rgb_marched = jnp.clip(rgb_marched + (1.0 - cum_weights) * bg, 0.0, 1.0)
    normal_marched = (w * (gradient / (safe_norm(gradient, keepdims=True) + 1e-6))).sum(axis=1)

    n_step = (weights * step).sum(axis=1)
    d_norm = jnp.maximum(jnp.linalg.norm(rays_d, axis=-1), 1e-12)
    depth = samp.t_min / d_norm + n_step
    disp = 1.0 / jnp.maximum(depth, 1e-8)

    return {
        "rgb_marched": rgb_marched,
        "normal_marched": normal_marched,
        "cum_weights": cum_weights,
        "alphainv_cum": alphainv_last,
        "weights": weights,
        "raw_alpha": alpha,
        "depth": depth,
        "disp": disp,
        "mask": mask,
        "gradient": gradient,
        "s_val": s_val,
        "n_step": n_step,
        **aux,
    }


def query_surface_points(
    params: dict,
    cfg: ObjectConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    use_deform: bool = False,
    is_train: bool = False,
    rng: jax.Array | None = None,
    near: float = 0.3,
    far: float = 4.0,
):
    """First SDF zero-crossing along each ray (PnP anchors / reprojection).

    Mirrors `query_sdf_point_wocuda(_wodeform)` (`voxurf_coarse.py:734-837`):
    out-of-bbox samples carry sdf=1, the first sign change is located by
    argmax over the sign-change indicator, and the crossing is linearly
    interpolated: z* = (s1*z2 - s2*z1)/(s1 - s2).

    Returns (points [N, 3], valid [N] bool, sdf_d [N, S]).
    """
    lo, hi = _bounds(cfg)
    samp = ray_sampling.sample_ray(
        rays_o, rays_d, lo, hi, near=near, far=far, stepsize=cfg.stepsize,
        voxel_size=jnp.asarray(cfg.voxel_size), n_samples=cfg.n_samples,
        rng=rng if is_train else None,
    )
    sdf_grid = processed_sdf_grid(params, cfg)
    sdf, _ = sdf_with_deform(params, cfg, sdf_grid, samp.pts, use_deform)
    sdf_d = jnp.where(samp.mask_inbbox, sdf, 1.0)  # [N, S]

    prev_sdf, next_sdf = sdf_d[:, :-1], sdf_d[:, 1:]
    sign_change = (prev_sdf * next_sdf) <= 0
    prev_idx = jnp.argmax(sign_change.astype(jnp.int32), axis=1)  # [N]
    next_idx = prev_idx + 1
    sdf1 = jnp.take_along_axis(sdf_d, prev_idx[:, None], axis=1)[:, 0]
    sdf2 = jnp.take_along_axis(sdf_d, next_idx[:, None], axis=1)[:, 0]
    dist = cfg.stepsize * cfg.voxel_size
    z1 = prev_idx.astype(jnp.float32) * dist + dist * 0.5
    z2 = next_idx.astype(jnp.float32) * dist + dist * 0.5
    # sign-preserving denominator guard: a shallow crossing (sdf1 ~ sdf2)
    # must not blow up the backward pass through the division
    denom = sdf1 - sdf2
    denom = jnp.sign(denom) * jnp.maximum(jnp.abs(denom), 1e-6) + jnp.where(denom == 0, 1e-6, 0.0)
    z_star = (sdf1 * z2 - sdf2 * z1) / denom
    z_star = jnp.where((z_star < z1) | (z_star > z2), 0.0, z_star)
    valid = (z_star > 1e-10) & ((sdf1 * sdf2) < 0)

    d_norm = jnp.maximum(jnp.linalg.norm(rays_d, axis=-1), 1e-12)
    interpx = samp.t_min + z_star / d_norm
    points = rays_o + rays_d * interpx[:, None]
    return points, valid, sdf_d


def query_surface_points_render(
    params: dict,
    cfg: ObjectConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    global_step,
    use_deform: bool = True,
    rng: jax.Array | None = None,
    near: float = 0.3,
    far: float = 4.0,
    mask_grid: jnp.ndarray | None = None,
    mask_k: int | None = None,
):
    """Differentiable surface localisation via volume-rendered expected depth.

    Mirrors `query_sdf_point_wocuda_render` (`voxurf_coarse.py:839-920`):
    depth = t_min/|d| + sum(w * step); valid where any weight mass exists.
    `mask_grid` enables the same free-space compaction as `render` (the
    per-sample grid VJPs are per-row serialization-bound, so halving the
    sample rows halves this pass's dominant cost).
    Returns (points [N, 3], valid [N] bool, depth [N]).
    """
    lo, hi = _bounds(cfg)
    samp = ray_sampling.sample_ray(
        rays_o, rays_d, lo, hi, near=near, far=far, stepsize=cfg.stepsize,
        voxel_size=jnp.asarray(cfg.voxel_size), n_samples=cfg.n_samples,
        rng=rng,
    )
    pts, step, mask = samp.pts, samp.step, samp.mask_inbbox
    if mask_grid is not None:
        occ = maskcache.mask_lookup(mask_grid, pts, lo, hi)
        comp = maskcache.compact_ray_samples(pts, step, mask & occ,
                                             mask_k or cfg.maskcache_K)
        pts, step, mask = comp.pts, comp.step, comp.mask
    sdf_grid = processed_sdf_grid(params, cfg)

    if use_deform:
        deform, correction, jac_warp, grad_corr = deform_mod.deform_with_jacobian_fwd(
            params["warpnet"], pts)
        sdf_val, tri_grad = grid_ops.trilinear_sample_with_grad(
            sdf_grid, pts + deform, lo, hi)
        sdf = sdf_val[..., 0] + correction[..., 0]
        gradient = jnp.einsum("...ji,...i->...j", jac_warp, tri_grad[..., 0, :]) + grad_corr
    else:
        sdf_val, tri_grad = grid_ops.trilinear_sample_with_grad(sdf_grid, pts, lo, hi)
        sdf = sdf_val[..., 0]
        gradient = tri_grad[..., 0, :]
    dist = cfg.stepsize * cfg.voxel_size
    s_val = compositing.s_val_schedule(global_step, cfg.s_ratio, cfg.s_start, cfg.step_start) \
        if not cfg.s_learn else params["s_val"]
    viewdirs = rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    alpha = compositing.neus_alpha_from_sdf(viewdirs[:, None, :], dist, sdf, gradient, s_val)
    alpha = jnp.where(mask, alpha, 0.0)
    weights, _ = compositing.alpha2weights(alpha)
    n_step = (weights * step).sum(axis=1)
    d_norm = jnp.maximum(jnp.linalg.norm(rays_d, axis=-1), 1e-12)
    # depth in units of the (unnormalized) direction, like ref :910
    depth = samp.t_min + n_step / d_norm
    valid = n_step > 0.0
    points = rays_o + rays_d * depth[:, None]
    return points, valid, depth


def mesh_color_forward(params: dict, cfg: ObjectConfig, pts: np.ndarray,
                       chunk: int = 65536) -> np.ndarray:
    """Vertex colors for mesh export, using the surface normal as the view
    direction (`mesh_color_forward`, referenced by `validate_deform_mesh`,
    `recon_scene.py:864-869`). pts: [V, 3] world vertices -> [V, 3] rgb."""
    lo, hi = _bounds(cfg)
    sdf_grid = processed_sdf_grid(params, cfg)

    @jax.jit
    def q(p):
        deform, correction = deform_mod.apply_deform(params["warpnet"], p)
        _, tri_grad = grid_ops.trilinear_sample_with_grad(sdf_grid, p + deform, lo, hi)
        gradient = tri_grad[:, 0, :]
        normal = gradient / (safe_norm(gradient, keepdims=True) + 1e-5)
        rgb = _color_head(params, cfg, p[:, None, :], -normal, gradient[:, None, :],
                          1.0, lo, hi)
        return rgb[:, 0]

    out = [np.asarray(q(jnp.asarray(pts[i:i + chunk], jnp.float32)))
           for i in range(0, len(pts), chunk)]
    return np.clip(np.concatenate(out), 0.0, 1.0)


def extract_sdf_volume(params: dict, cfg: ObjectConfig, resolution: int, use_deform: bool = True,
                       chunk: int = 65536) -> np.ndarray:
    """Dense (-SDF) volume for marching cubes (`extract_deform_geometry`, `:1224-1248`)."""
    lo, hi = cfg.xyz_min_np, cfg.xyz_max_np
    xs = np.linspace(lo[0], hi[0], resolution)
    ys = np.linspace(lo[1], hi[1], resolution)
    zs = np.linspace(lo[2], hi[2], resolution)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    sdf_grid = processed_sdf_grid(params, cfg)

    @jax.jit
    def q(p):
        s, _ = sdf_with_deform(params, cfg, sdf_grid, p, use_deform)
        return -s

    out = np.concatenate([np.asarray(q(jnp.asarray(pts[i:i + chunk])))
                          for i in range(0, pts.shape[0], chunk)])
    return out.reshape(resolution, resolution, resolution)
