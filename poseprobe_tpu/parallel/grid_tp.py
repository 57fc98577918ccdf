"""Grid tensor parallelism: Z-sharded dense voxel grids with halo exchange.

The reference is single-GPU by construction and its grids always fit one
device (`lib/bg_nerf/train_settings/default_config.py:25`). On TPU the dense
[C, X, Y, Z] grids are replicated up to ~160^3 (SURVEY §2.3); above that one
v5e chip's HBM runs out and the grid itself must be sharded. This module is
that extension point made real: the grid lives partitioned along its Z axis
over a ``'grid'`` mesh axis, and trilinear reads work across shard boundaries
via a one-plane +Z halo exchange (`jax.lax.ppermute` over ICI).

Design (exact, not approximate):

* Shard ``s`` of ``G`` holds planes ``[s*Zl, (s+1)*Zl)`` with ``Zl = Z // G``
  plus a halo copy of plane ``(s+1)*Zl`` from its +Z neighbour (the last
  shard duplicates its own final plane — the duplicate makes border-clamp
  values AND point-gradients exactly match the unsharded op, because the
  z-lerp between two identical planes has zero slope).
* Every query point has exactly one owner shard (the one holding
  ``floor(iz)``); each shard samples all points against its local extended
  block with locally rebased world bounds — the align-corners index map is
  linear, so the local interpolation matches the global one for owned points
  to f32 rounding of the rebased coordinate (~1e-6 relative, tested) — masks
  non-owned outputs to zero, and a ``psum`` assembles the full result.
* Gradients need no extra code: ``ppermute``/``psum`` are linear (JAX
  transposes them automatically) and the per-shard sample reuses the custom
  VJP of `ops.grid.trilinear_sample` (flat scatter-add backward), so the
  hand-optimized TPU backward path is preserved under sharding.

Known caveat: exactly ON a cell seam the trilerp derivative is one-sided,
and the rebased local coordinate can round to the other side of the seam
than the global coordinate does, picking the abutting cell's slope — values
are continuous (unaffected); only point-gradients at exact seams differ,
the same sensitivity the unsharded op has to 1-ulp input perturbations.

This is a memory-capacity lever, not a FLOP saver: the corner gathers are
replicated across the grid axis (each shard touches all N points), but
gathers are cheap next to the MLPs while grid memory drops by 1/G. Combine
with the ray-DP axis (`parallel/mesh.py`) on a 2-D ``('data', 'grid')`` mesh
to shard both rays and grids.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import grid as grid_ops
from .mesh import DATA_AXIS

GRID_AXIS = "grid"


def make_grid_mesh(n_data: int, n_grid: int, devices=None) -> Mesh:
    """2-D device mesh ('data', 'grid'): rays DP x grid TP."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_data * n_grid:
        raise ValueError(f"need {n_data * n_grid} devices, have {len(devices)}")
    arr = np.asarray(devices[: n_data * n_grid]).reshape(n_data, n_grid)
    return Mesh(arr, ("data", GRID_AXIS))


def grid_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for a [C, X, Y, Z] grid: Z partitioned over the grid axis."""
    return NamedSharding(mesh, P(None, None, None, GRID_AXIS))


def shard_grid(grid: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [C, X, Y, Z] grid Z-sharded over the mesh's grid axis."""
    Z = grid.shape[-1]
    G = mesh.shape[GRID_AXIS]
    if Z % G != 0:
        raise ValueError(f"grid Z={Z} not divisible by grid axis size {G}")
    return jax.device_put(grid, grid_spec(mesh))


def _halo_extend(local: jnp.ndarray, axis_name: str, G: int) -> jnp.ndarray:
    """[..., Zl] local block -> [..., Zl+1] with the +Z neighbour's first plane.

    The last shard has no +Z neighbour; it appends a copy of its own final
    plane, which reproduces global border-clamp semantics exactly (values
    identical, z-slope zero).
    """
    s = jax.lax.axis_index(axis_name)
    halo = jax.lax.ppermute(local[..., :1], axis_name,
                            [(i, (i - 1) % G) for i in range(G)])
    halo = jnp.where(s == G - 1, local[..., -1:], halo)
    return jnp.concatenate([local, halo], axis=-1)


def sample_grid_tp(grid: jnp.ndarray, xyz: jnp.ndarray,
                   xyz_min: jnp.ndarray, xyz_max: jnp.ndarray,
                   mesh: Mesh, *, data_sharded_points: bool = False) -> jnp.ndarray:
    """Trilinear sampling of a Z-sharded grid. Exact parity with
    `ops.grid.trilinear_sample` (values and gradients, incl. border clamp).

    grid: [C, X, Y, Z] logically; physically sharded along Z (see shard_grid).
    xyz: [..., 3] world points, replicated over the grid axis. With
    ``data_sharded_points=True`` the leading axis is additionally sharded
    over the 'data' mesh axis (rays-DP x grid-TP).
    Returns [..., C] with the same sharding as the points.
    """
    C, X, Y, Z = grid.shape
    G = mesh.shape[GRID_AXIS]
    if Z % G != 0:
        raise ValueError(f"grid Z={Z} not divisible by grid axis size {G}")
    Zl = Z // G
    batch_shape = xyz.shape[:-1]
    pts_spec = P("data") if data_sharded_points else P()

    def local_fn(gl, pts, lo, hi):
        # gl: [C, X, Y, Zl]; pts: [N, 3] (this data-shard's slice); lo/hi: [3]
        # pcast-to-varying: the replicated points feed shard-varying math
        # (ownership mask), so their cotangents are shard-varying too — the
        # cast's transpose is the psum that makes the pts gradient exact.
        pts = jax.lax.pcast(pts, GRID_AXIS, to="varying")
        lo = jax.lax.pcast(lo, GRID_AXIS, to="varying")
        hi = jax.lax.pcast(hi, GRID_AXIS, to="varying")
        if data_sharded_points:
            # the grid (replicated over 'data') feeds data-varying math; the
            # pcast's transpose is the psum over 'data' that assembles the
            # grid cotangent from every ray shard — without it the shard_map
            # transpose cannot statically prove the grid grad replicated
            gl = jax.lax.pcast(gl, DATA_AXIS, to="varying")
            lo = jax.lax.pcast(lo, DATA_AXIS, to="varying")
            hi = jax.lax.pcast(hi, DATA_AXIS, to="varying")
        s = jax.lax.axis_index(GRID_AXIS)
        gext = _halo_extend(gl, GRID_AXIS, G)
        vz = (hi[2] - lo[2]) / (Z - 1)
        zmin_s = lo[2] + s.astype(lo.dtype) * Zl * vz
        lmin = jnp.stack([lo[0], lo[1], zmin_s])
        lmax = jnp.stack([hi[0], hi[1], zmin_s + Zl * vz])
        out = grid_ops.trilinear_sample(gext, pts, lmin, lmax)  # [N, C]
        iz = (pts[:, 2] - lo[2]) / (hi[2] - lo[2]) * (Z - 1)
        z0 = jnp.clip(jnp.floor(jnp.clip(iz, 0.0, Z - 1.0)), 0, Z - 2)
        own = (z0.astype(jnp.int32) // Zl) == s
        return jax.lax.psum(jnp.where(own[:, None], out, 0.0), GRID_AXIS)

    sampled = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, None, GRID_AXIS), pts_spec, P(), P()),
        out_specs=pts_spec,
    )(grid, xyz.reshape(-1, 3), jnp.asarray(xyz_min), jnp.asarray(xyz_max))
    return sampled.reshape(*batch_shape, C)


def total_variation_tp(v: jnp.ndarray, mesh: Mesh,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """TV loss of a Z-sharded grid; parity with `ops.grid.total_variation`.

    x/y difference pairs live entirely inside one shard; z pairs across the
    boundary use the halo plane. Each global pair is counted exactly once
    (shard s covers z-pairs starting at its own planes), and the last shard's
    duplicated halo contributes a zero diff. Sums are psum-reduced and
    normalised by the GLOBAL element/mask count.
    """
    C, X, Y, Z = v.shape
    G = mesh.shape[GRID_AXIS]
    if Z % G != 0:
        raise ValueError(f"grid Z={Z} not divisible by grid axis size {G}")

    def local_fn(vl, ml):
        vext = _halo_extend(vl, GRID_AXIS, G)
        tv_x = jnp.abs(vl[:, 1:, :, :] - vl[:, :-1, :, :])
        tv_y = jnp.abs(vl[:, :, 1:, :] - vl[:, :, :-1, :])
        tv_z = jnp.abs(vext[:, :, :, 1:] - vext[:, :, :, :-1])
        if ml is not None:
            mext = _halo_extend(ml.astype(vl.dtype), GRID_AXIS, G)
            mloc = mext[..., :-1]
            tv_x = tv_x * (mloc[:, 1:] * mloc[:, :-1])
            tv_y = tv_y * (mloc[:, :, 1:] * mloc[:, :, :-1])
            tv_z = tv_z * (mext[:, :, :, 1:] * mext[:, :, :, :-1])
            denom = jax.lax.psum(mloc.sum(), GRID_AXIS)
        else:
            denom = jnp.asarray(v.size, dtype=vl.dtype)
        total = jax.lax.psum(tv_x.sum() + tv_y.sum() + tv_z.sum(), GRID_AXIS)
        return total / 3.0 / denom

    gspec = P(None, None, None, GRID_AXIS)
    if mask is None:
        return jax.shard_map(lambda vl: local_fn(vl, None), mesh=mesh,
                             in_specs=(gspec,), out_specs=P())(v)
    return jax.shard_map(local_fn, mesh=mesh, in_specs=(gspec, gspec),
                         out_specs=P())(v, mask)
