"""Scene branch: frequency-encoded MLP NeRF (coarse + fine) with BARF c2f PE.

TPU-native rebuild of the SPARF scene model:
* `NeRF` MLP (`lib/bg_nerf/source/models/frequency_nerf.py:72-281`):
  feat trunk [input, 256 x 8] with skip at layer 4, last layer emits
  density + 256-d feature; rgb head [feat(+view), 128, 3]; softplus density,
  sigmoid rgb; tensorflow-style (xavier) init.
* `Graph.render` coarse + hierarchical fine sampling (`renderer.py:532-627`),
  `render_to_max` visibility rendering (`renderer.py:741-909`).

The MLP evaluation is pure matmuls -> MXU-friendly as-is; points are kept in
a dense [B, R, S, ...] layout so XLA fuses PE + MLP + compositing.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import rays as rays_mod
from ..ops import compositing, pe, ray_sampling
from ..ops.pallas import fused_mlp
from .mlp import apply_mlp, init_linear


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Static scene-branch config (subset of SPARF's opt tree that is live)."""

    layers_feat: tuple = (256,) * 8
    layers_rgb: tuple = (128, 3)
    skip: tuple = (4,)
    L_3D: int = 10
    L_view: int = 4
    add_raw_3d: bool = True
    add_raw_rays: bool = True
    include_pi: bool = True
    density_activ: str = "softplus"
    view_dep: bool = True
    barf_c2f: tuple | None = (0.4, 0.7)
    # sampling (train_settings/default_config.py:114-117, dtu/sparf.py:50-54)
    sample_intvs: int = 128
    sample_intvs_fine: int = 128
    fine_sampling: bool = True
    depth_param: str = "metric"  # dtu/replica use metric
    rand_rays: int = 1024
    setbg_opaque: bool = False
    max_iter: int = 60000
    ratio_start_fine_sampling_at_x: float | None = 0.3
    # MXU-native mixed precision for the MLP: "bfloat16" runs the whole trunk
    # with bf16 weights AND bf16 activations (single-pass MXU matmuls, half
    # the HBM activation traffic) while the optimizer keeps f32 master
    # weights — the cast happens once per step on the (tiny) param tree, not
    # per matmul. Density/rgb heads and everything outside the MLP (PE,
    # compositing, losses) stay float32. The fine-sampled scene MLPs are ~77%
    # of the joint step time (PERFORMANCE.md ablation); f32 matmuls on this
    # JAX/TPU build execute as 3-pass bf16 (66 TFLOP/s measured), so native
    # bf16 raises the matmul roofline ~3x. Default float32 keeps unit-test
    # parity bit-exact; set "bfloat16" in production presets/bench.
    matmul_dtype: str = "float32"
    # Fused Pallas trunk (ops/pallas/fused_mlp.py): keeps all 8 trunk matmuls
    # and their activations in VMEM (bwd rematerialises per-tile), removing
    # the [N, 256]-per-layer HBM activation round-trips that cap the XLA
    # trunk at ~1/3 of the MXU roofline. Engages automatically on TPU when
    # matmul_dtype is bfloat16 and the architecture fits the kernel's layout
    # contract (uniform width % 128 == 0, single mid skip).
    use_fused_trunk: bool = True

    @property
    def input_3d_dim(self) -> int:
        return (3 if self.add_raw_3d else 0) + 6 * self.L_3D

    @property
    def input_view_dim(self) -> int:
        return (3 if self.add_raw_rays else 0) + 6 * self.L_view


def init_nerf_mlp(key, cfg: SceneConfig) -> dict:
    """One NeRF MLP (coarse or fine), tf-style init (`frequency_nerf.py:87-147`)."""
    keys = jax.random.split(key, len(cfg.layers_feat) + len(cfg.layers_rgb))
    feat_layers = []
    dims = list(cfg.layers_feat)
    d_in = cfg.input_3d_dim
    for li, d_out in enumerate(dims):
        k_in = d_in if li == 0 else dims[li - 1]
        if li in cfg.skip:
            k_in += cfg.input_3d_dim
        k_out = d_out + 1 if li == len(dims) - 1 else d_out  # +1 density on last
        scheme = "xavier_relu"
        layer = init_linear(keys[li], k_in, k_out, scheme)
        if li == len(dims) - 1:
            # out="first": xavier (gain 1) on the density row, relu-gain on the rest;
            # approximate by re-initializing the density column without gain
            plain = init_linear(keys[li], k_in, k_out, "xavier")
            layer = {"w": layer["w"].at[:, :1].set(plain["w"][:, :1]), "b": layer["b"]}
        feat_layers.append(layer)
    rgb_layers = []
    d_in = dims[-1] + (cfg.input_view_dim if cfg.view_dep else 0)
    for li, d_out in enumerate(cfg.layers_rgb):
        scheme = "xavier" if li == len(cfg.layers_rgb) - 1 else "xavier_relu"
        rgb_layers.append(init_linear(keys[len(dims) + li], d_in, d_out, scheme))
        d_in = d_out
    return {"feat": feat_layers, "rgb": rgb_layers}


def init_scene_params(key, cfg: SceneConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = {"nerf": init_nerf_mlp(k1, cfg)}
    if cfg.fine_sampling:
        params["nerf_fine"] = init_nerf_mlp(k2, cfg)
    return params


def cast_mlp_params(params: dict, dtype: str):
    """Cast the scene param tree to the compute dtype, once per step.

    With ``matmul_dtype='bfloat16'`` the trainer calls this inside the loss so
    the optimizer keeps f32 master weights and gradients come back f32 through
    the convert's transpose — native-bf16 storage without per-matmul casts
    (the round-2 per-operand-cast experiment measured *slower*)."""
    if dtype != "bfloat16":
        return params
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)


def _mm(x: jnp.ndarray, w: jnp.ndarray, b=None):
    """[..., K] @ [K, N] (+ bias) in the operands' dtype.

    bf16 x bf16 -> bf16 keeps activations bf16 end-to-end: one MXU pass per
    matmul and half the HBM activation traffic vs f32 (which this JAX/TPU
    build executes as 3-pass bf16 anyway)."""
    out = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=x.dtype)
    return out if b is None else out + b


def nerf_forward(mlp: dict, cfg: SceneConfig, points: jnp.ndarray, ray: jnp.ndarray, progress) -> dict:
    """MLP prediction at [B, R, S, 3] points with [B, R, 3] ray directions.

    Returns dict(rgb_samples [B,R,S,3], density_samples [B,R,S]) in float32.
    """
    cdt = jnp.bfloat16 if cfg.matmul_dtype == "bfloat16" else jnp.float32
    mlp = cast_mlp_params(mlp, cfg.matmul_dtype)  # no-op if already cast
    enc = pe.posenc_scene(points, cfg.L_3D, progress, cfg.barf_c2f,
                          include_pi=cfg.include_pi, add_raw=cfg.add_raw_3d).astype(cdt)
    if (cfg.use_fused_trunk and cdt == jnp.bfloat16
            and fused_mlp.supports(cfg) and fused_mlp.on_tpu()):
        raw_density, feat = fused_mlp.fused_trunk(enc, mlp["feat"], cfg.skip[0])
    else:
        feat = enc
        for li, layer in enumerate(mlp["feat"]):
            if li in cfg.skip:
                feat = jnp.concatenate([feat, enc], axis=-1)
            feat = _mm(feat, layer["w"], layer["b"])
            if li == len(mlp["feat"]) - 1:
                raw_density = feat[..., 0].astype(jnp.float32)
                feat = feat[..., 1:]
            feat = jax.nn.relu(feat)
    density = jax.nn.softplus(raw_density) if cfg.density_activ == "softplus" else jax.nn.relu(raw_density)

    if cfg.view_dep:
        # the view encoding is constant along the samples axis: encode per-ray
        # and push it through the first rgb matmul BEFORE broadcasting, saving
        # S x the PE transcendentals and S x the matmul FLOPs for that slice
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-12)
        ray_enc = pe.posenc_scene(ray_unit, cfg.L_view, progress, cfg.barf_c2f,
                                  include_pi=cfg.include_pi, add_raw=cfg.add_raw_rays).astype(cdt)
        first = mlp["rgb"][0]
        feat_dim = feat.shape[-1]
        h = _mm(feat, first["w"][:feat_dim], first["b"])
        h_view = _mm(ray_enc, first["w"][feat_dim:])
        h = h + h_view[..., None, :]
        for li, layer in enumerate(mlp["rgb"][1:]):
            h = _mm(jax.nn.relu(h), layer["w"], layer["b"])
        rgb = jax.nn.sigmoid(h.astype(jnp.float32))
    else:
        h = feat
        for li, layer in enumerate(mlp["rgb"]):
            if li > 0:
                h = jax.nn.relu(h)
            h = _mm(h, layer["w"], layer["b"])
        rgb = jax.nn.sigmoid(h.astype(jnp.float32))
    return {"rgb_samples": rgb, "density_samples": density}


def render_rays(
    params: dict,
    cfg: SceneConfig,
    center: jnp.ndarray,
    ray: jnp.ndarray,
    depth_range,
    progress,
    rng: jax.Array | None,
    compute_fine: bool,
    mode_train: bool = True,
) -> dict[str, Any]:
    """Coarse (+ optional fine) rendering of pre-computed rays [B, R, 3].

    Mirrors `Graph.render` (`renderer.py:532-627`); fine depth resampling is
    stop-gradiented like the reference's no_grad block.
    """
    B, R = ray.shape[:2]
    depth_min, depth_max = depth_range
    rng_c, rng_f = (jax.random.split(rng) if rng is not None else (None, None))
    depth_samples = ray_sampling.sample_depth_stratified(
        rng_c if mode_train else None, B, R, cfg.sample_intvs, depth_min, depth_max,
        param=cfg.depth_param)
    points = rays_mod.get_3d_points_from_depth(center, ray, depth_samples, multi_samples=True)
    pred = nerf_forward(params["nerf"], cfg, points, ray, progress)
    out_c = compositing.nerf_composite(pred["rgb_samples"], pred["density_samples"],
                                       depth_samples, ray, setbg_opaque=cfg.setbg_opaque)
    result = {
        "rgb": out_c.rgb, "rgb_var": out_c.rgb_var, "depth": out_c.depth,
        "depth_var": out_c.depth_var, "opacity": out_c.opacity, "weights": out_c.weights,
        "all_cumulated": out_c.all_cumulated, "t": depth_samples,
        "origins": center, "viewdirs": ray,
    }
    if cfg.fine_sampling and compute_fine:
        w = jax.lax.stop_gradient(out_c.weights[..., 0])
        depth_fine = ray_sampling.sample_depth_from_pdf(
            rng_f if mode_train else None, w, cfg.sample_intvs, cfg.sample_intvs_fine,
            depth_min, depth_max)
        if cfg.depth_param == "metric":
            # both sets are per-ray ascending (stratified bins; sorted-grid
            # inverse CDF), so an exact rank merge replaces the 2S bitonic sort
            depth_all = ray_sampling.merge_sorted_depths(
                depth_samples, jax.lax.stop_gradient(depth_fine))
        else:
            # inverse parameterization yields descending 1/d coarse depths —
            # the rank merge's ascending precondition fails; fall back to the
            # reference's plain sort (`renderer.py:616`)
            depth_all = jnp.sort(jnp.concatenate(
                [depth_samples, jax.lax.stop_gradient(depth_fine)], axis=-2), axis=-2)
        points_f = rays_mod.get_3d_points_from_depth(center, ray, depth_all, multi_samples=True)
        pred_f = nerf_forward(params["nerf_fine"], cfg, points_f, ray, progress)
        out_f = compositing.nerf_composite(pred_f["rgb_samples"], pred_f["density_samples"],
                                           depth_all, ray, setbg_opaque=cfg.setbg_opaque)
        result.update({
            "rgb_fine": out_f.rgb, "rgb_var_fine": out_f.rgb_var, "depth_fine": out_f.depth,
            "depth_var_fine": out_f.depth_var, "opacity_fine": out_f.opacity,
            "weights_fine": out_f.weights, "all_cumulated_fine": out_f.all_cumulated,
            "t_fine": depth_all,
        })
    return result


def render_rays_to_max(
    params: dict,
    cfg: SceneConfig,
    center: jnp.ndarray,
    ray: jnp.ndarray,
    depth_min,
    depth_max: jnp.ndarray,
    progress,
    compute_fine: bool,
) -> dict[str, Any]:
    """Render each ray only up to a per-ray max depth (visibility check).

    Mirrors `Graph.render_to_max` (`renderer.py:786-875`): the `all_cumulated`
    output is the probability the ray travels to (nearly) that depth unoccluded.
    """
    B, R = ray.shape[:2]
    depth_samples = ray_sampling.sample_depth_to_max(B, R, cfg.sample_intvs, depth_min, depth_max)
    points = rays_mod.get_3d_points_from_depth(center, ray, depth_samples, multi_samples=True)
    pred = nerf_forward(params["nerf"], cfg, points, ray, progress)
    out_c = compositing.nerf_composite(pred["rgb_samples"], pred["density_samples"],
                                       depth_samples, ray, setbg_opaque=cfg.setbg_opaque)
    result = {"all_cumulated": out_c.all_cumulated, "depth": out_c.depth, "opacity": out_c.opacity}
    if cfg.fine_sampling and compute_fine:
        pred_f = nerf_forward(params["nerf_fine"], cfg, points, ray, progress)
        out_f = compositing.nerf_composite(pred_f["rgb_samples"], pred_f["density_samples"],
                                           depth_samples, ray, setbg_opaque=cfg.setbg_opaque)
        result["all_cumulated_fine"] = out_f.all_cumulated
    return result
