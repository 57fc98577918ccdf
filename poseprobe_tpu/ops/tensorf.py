"""TensoRF vector-matrix decomposed grid (VM factorization).

Functional rebuild of `TensoRFGrid` (`lib/grid.py:95-246`): the field is a sum
of plane x vector outer products with an optional feature-mixing matrix. Each
query is three bilinear plane lookups + three linear vector lookups + one
matmul — MXU-friendly and far lighter on HBM than a dense grid at high
resolutions.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_tensorf_params(key, channels: int, world_size, n_comp: int,
                        n_comp_xy: int | None = None) -> dict:
    X, Y, Z = world_size
    R = n_comp
    Rxy = n_comp_xy if n_comp_xy is not None else R
    ks = jax.random.split(key, 7)
    params = {
        "xy_plane": jax.random.normal(ks[0], (Rxy, X, Y)) * 0.1,
        "xz_plane": jax.random.normal(ks[1], (R, X, Z)) * 0.1,
        "yz_plane": jax.random.normal(ks[2], (R, Y, Z)) * 0.1,
        "x_vec": jax.random.normal(ks[3], (R, X)) * 0.1,
        "y_vec": jax.random.normal(ks[4], (R, Y)) * 0.1,
        "z_vec": jax.random.normal(ks[5], (Rxy, Z)) * 0.1,
    }
    if channels > 1:
        bound = math.sqrt(1.0 / (R + R + Rxy)) * math.sqrt(3.0)
        params["f_vec"] = jax.random.uniform(ks[6], (R + R + Rxy, channels),
                                             minval=-bound, maxval=bound)
    return jax.tree.map(lambda a: a.astype(jnp.float32), params)


def _bilerp_plane(plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """plane [R, A, B]; u, v in [0, 1] -> [N, R] (align_corners=True)."""
    A, B = plane.shape[1], plane.shape[2]
    ia = jnp.clip(u * (A - 1), 0.0, A - 1.0)
    ib = jnp.clip(v * (B - 1), 0.0, B - 1.0)
    a0 = jnp.clip(jnp.floor(ia), 0, A - 2).astype(jnp.int32)
    b0 = jnp.clip(jnp.floor(ib), 0, B - 2).astype(jnp.int32)
    wa = ia - a0
    wb = ib - b0
    p00 = plane[:, a0, b0]
    p01 = plane[:, a0, b0 + 1]
    p10 = plane[:, a0 + 1, b0]
    p11 = plane[:, a0 + 1, b0 + 1]
    top = p00 * (1 - wb) + p01 * wb
    bot = p10 * (1 - wb) + p11 * wb
    return (top * (1 - wa) + bot * wa).T  # [N, R]


def _lerp_vec(vec: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """vec [R, A]; u in [0, 1] -> [N, R]."""
    A = vec.shape[1]
    ia = jnp.clip(u * (A - 1), 0.0, A - 1.0)
    a0 = jnp.clip(jnp.floor(ia), 0, A - 2).astype(jnp.int32)
    wa = ia - a0
    return (vec[:, a0] * (1 - wa) + vec[:, a0 + 1] * wa).T


def tensorf_sample(params: dict, xyz: jnp.ndarray, xyz_min, xyz_max) -> jnp.ndarray:
    """Query world points [..., 3] -> [..., C] (or [...] when channels == 1)."""
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    u = (pts - xyz_min) / (xyz_max - xyz_min)
    ux, uy, uz = u[:, 0], u[:, 1], u[:, 2]
    xy = _bilerp_plane(params["xy_plane"], ux, uy)
    xz = _bilerp_plane(params["xz_plane"], ux, uz)
    yz = _bilerp_plane(params["yz_plane"], uy, uz)
    xv = _lerp_vec(params["x_vec"], ux)
    yv = _lerp_vec(params["y_vec"], uy)
    zv = _lerp_vec(params["z_vec"], uz)
    if "f_vec" in params:
        feat = jnp.concatenate([xy * zv, xz * yv, yz * xv], axis=-1)  # [N, 2R+Rxy]
        out = feat @ params["f_vec"]
        return out.reshape(*shape, -1)
    val = (xy * zv).sum(-1) + (xz * yv).sum(-1) + (yz * xv).sum(-1)
    return val.reshape(shape)


def tensorf_to_dense(params: dict) -> jnp.ndarray:
    """Expand to a dense grid [C, X, Y, Z] (`get_dense_grid`, `lib/grid.py:162-176`)."""
    if "f_vec" in params:
        feat = jnp.concatenate([
            jnp.einsum("rxy,rz->rxyz", params["xy_plane"], params["z_vec"]),
            jnp.einsum("rxz,ry->rxyz", params["xz_plane"], params["y_vec"]),
            jnp.einsum("ryz,rx->rxyz", params["yz_plane"], params["x_vec"]),
        ])
        return jnp.einsum("rxyz,rc->cxyz", feat, params["f_vec"])
    grid = (jnp.einsum("rxy,rz->xyz", params["xy_plane"], params["z_vec"])
            + jnp.einsum("rxz,ry->xyz", params["xz_plane"], params["y_vec"])
            + jnp.einsum("ryz,rx->xyz", params["yz_plane"], params["x_vec"]))
    return grid[None]


def tensorf_total_variation(params: dict, wx: float = 1.0, wy: float = 1.0, wz: float = 1.0) -> jnp.ndarray:
    """Smooth-L1 TV over planes + vectors (`total_variation_add_grad`, `lib/grid.py:147-160`),
    expressed as a loss for jax.grad."""

    def sl1(a, b):
        d = a - b
        ad = jnp.abs(d)
        return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5).sum()

    loss = (wx * sl1(params["xy_plane"][:, 1:], params["xy_plane"][:, :-1])
            + wy * sl1(params["xy_plane"][:, :, 1:], params["xy_plane"][:, :, :-1])
            + wx * sl1(params["xz_plane"][:, 1:], params["xz_plane"][:, :-1])
            + wz * sl1(params["xz_plane"][:, :, 1:], params["xz_plane"][:, :, :-1])
            + wy * sl1(params["yz_plane"][:, 1:], params["yz_plane"][:, :-1])
            + wz * sl1(params["yz_plane"][:, :, 1:], params["yz_plane"][:, :, :-1])
            + wx * sl1(params["x_vec"][:, 1:], params["x_vec"][:, :-1])
            + wy * sl1(params["y_vec"][:, 1:], params["y_vec"][:, :-1])
            + wz * sl1(params["z_vec"][:, 1:], params["z_vec"][:, :-1]))
    return loss / 6.0


def tensorf_resize(params: dict, new_world_size) -> dict:
    """Bilinear-resize planes and vectors (`scale_volume_grid`, `lib/grid.py:136-145`)."""
    from .grid import resize_trilinear  # reuse via [C, A, B, 1] trick

    X, Y, Z = new_world_size

    def resize_plane(p, a, b):
        return resize_trilinear(p[..., None], (a, b, 1))[..., 0]

    out = dict(params)
    out["xy_plane"] = resize_plane(params["xy_plane"], X, Y)
    out["xz_plane"] = resize_plane(params["xz_plane"], X, Z)
    out["yz_plane"] = resize_plane(params["yz_plane"], Y, Z)
    out["x_vec"] = resize_plane(params["x_vec"][:, :, None], X, 1)[:, :, 0]
    out["y_vec"] = resize_plane(params["y_vec"][:, :, None], Y, 1)[:, :, 0]
    out["z_vec"] = resize_plane(params["z_vec"][:, :, None], Z, 1)[:, :, 0]
    return out


# ------------------------------------------------------------------ MaskGrid

def make_mask_grid(sdf_grid: jnp.ndarray, xyz_min, xyz_max, thres: float = 1e9) -> dict:
    """Boolean free-space cache from an SDF grid (`MaskCache`, `voxurf_coarse.py:1271-1292`)."""
    return {
        "sdf": sdf_grid,
        "xyz_min": jnp.asarray(xyz_min, jnp.float32),
        "xyz_max": jnp.asarray(xyz_max, jnp.float32),
        "thres": float(thres),
    }


def mask_grid_lookup(mask: dict, xyz: jnp.ndarray) -> jnp.ndarray:
    """True where the cached SDF is below the threshold (occupied/unknown space).

    Replaces the CUDA `maskcache_lookup` (`render_utils_kernel.cu:374-424`)
    with a trilinear sample + compare.
    """
    from .grid import trilinear_sample

    sdf = trilinear_sample(mask["sdf"], xyz, mask["xyz_min"], mask["xyz_max"])[..., 0]
    return sdf < mask["thres"]
