"""Dense voxel grid primitives: trilinear sampling, rescaling, total variation.

TPU-native replacement for the reference grid stack:
* `DenseGrid.forward` / `grid_sampler` (`lib/grid.py:38-58`,
  `lib/voxurf_coarse.py:522-543`) — here a gather-based trilinear interpolation
  that is differentiable to arbitrary order, so the reference's special
  double-backward `grid_sample_3d` reimplementation
  (`lib/voxurf_coarse.py:545-659`) is unnecessary.
* `scale_volume_grid` via trilinear resize (`lib/grid.py:60-65`).
* `total_variation` (`lib/voxurf_coarse.py:1298-1313`) — expressed as a loss
  and differentiated by jax.grad instead of the CUDA grad-injection kernel
  (`lib/cuda/total_variation_kernel.cu:68-133`).

Grids are stored as plain arrays [C, X, Y, Z] inside parameter pytrees; there
is no module object. `border` padding semantics (clamp) match
`F.grid_sample(..., padding_mode="border", align_corners=True)`.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .pallas import layout as pallas_layout


def _pin_layout() -> bool:
    """Route multi-channel gather/scatter buffers through a pallas transpose
    so XLA cannot give them the column-major layout (see ops/pallas/layout.py
    — 22.2 ms/step profiled for the 12-ch k0 scatter without the pin). Off on
    CPU (tests) and via POSEPROBE_PIN_LAYOUT=0 (A/B microbench)."""
    if os.environ.get("POSEPROBE_PIN_LAYOUT", "1") == "0":
        return False
    from .pallas.fused_mlp import on_tpu

    return on_tpu()


def _rows_from_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """[C, X, Y, Z] -> flat [V, C] rows for the corner gather.

    No layout pin here: the profiled gather is happy with whatever layout XLA
    picks for its operand (13-ch corner gather: 2.1 ms/step at 467k rows),
    and pinning row-major via pallas made XLA insert a copy BACK to the
    gather's preferred {0,1} (+1.3 ms/step measured). The scatter side is
    the serialization-bound one — see `_scatter_rows_to_grid`."""
    C = grid.shape[0]
    flat = grid.reshape(C, -1).T
    if C > 1:
        flat = jax.lax.optimization_barrier(flat)
    return flat


def _grid_from_rows(d_flat: jnp.ndarray, gshape) -> jnp.ndarray:
    """Flat [V, C] rows (e.g. a scatter-add result) -> [C, X, Y, Z]."""
    C = gshape[0]
    if C > 1 and _pin_layout():
        return pallas_layout.transpose2d(d_flat).reshape(gshape)
    if C > 1:
        d_flat = jax.lax.optimization_barrier(d_flat)
    return d_flat.T.reshape(gshape)


_LANE = 128  # TPU lane width: full-tile-row scatter updates (see below)


def _use_window_scatter() -> bool:
    """(2,2,2) window scatter-add instead of 8 per-corner row updates.

    The 8 corners of a trilerp cell form one [2,2,2] window, so a window
    scatter-add does the same memory work with 8x fewer index entries.
    The isolated microbench wins (`benchmarks/microbench_window.py`, 58k
    pts, 96^3: C=1 scalar rows 3.63 ms -> window 0.10 ms; padded 128-lane
    rows 0.66 ms -> window 0.21 ms) did NOT transfer to the full train
    step: with this default ON the early-phase joint step regressed
    43.7 ms -> 800 ms on TPU v5e (logs/r3_queue/bench7.log vs bench8.log —
    XLA serializes the 4D-window scatter inside the fused grad graph),
    so it is opt-in via POSEPROBE_WINDOW_SCATTER=1 for experiments only."""
    return os.environ.get("POSEPROBE_WINDOW_SCATTER", "0") == "1"


def _scatter_barrier() -> bool:
    """Experimental: materialize the scatter updates through a pallas
    custom call before the scatter-add (POSEPROBE_SCATTER_BARRIER=1).

    Round-5 early-phase lever: the object-branch grad graph fuses into one
    opaque mega-fusion (32.9 ms of the 49.6 ms early step at the round-4
    HEAD); a custom-call edge at the scatter input forces XLA to split it.
    A/B via benchmarks/ablate.py before any default change."""
    return os.environ.get("POSEPROBE_SCATTER_BARRIER", "0") == "1"


def _use_window_gather() -> bool:
    """(2,2,2) window gather instead of 8 per-corner row gathers.

    Measured SLOWER on TPU v5e (same microbench: C=1 0.10 -> 0.38 ms,
    C=13 rows 0.08 -> 0.40 ms — XLA's gather emitter handles row gathers
    well already), so default OFF; POSEPROBE_WINDOW_GATHER=1 re-enables
    for experiments."""
    return os.environ.get("POSEPROBE_WINDOW_GATHER", "0") == "1"


def _starts_from_idx8(idx8: jnp.ndarray, gshape) -> jnp.ndarray:
    """Recover per-point (x0, y0, z0) window starts from the corner ids."""
    _, X, Y, Z = gshape
    base = idx8[:, 0]
    x0 = base // (Y * Z)
    rem = base % (Y * Z)
    return jnp.stack([x0, rem // Z, rem % Z], axis=-1)  # [N, 3]


def _gather_corners_window(flat: jnp.ndarray, idx8: jnp.ndarray, gshape):
    """[V, C] rows + corner ids -> [N, 8, C] via one (2,2,2[,C]) window gather."""
    C, X, Y, Z = gshape
    starts = _starts_from_idx8(idx8, gshape)
    op = flat.reshape(X, Y, Z, C)
    dn = jax.lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0, 1, 2))
    out = jax.lax.gather(op, starts, dn, slice_sizes=(2, 2, 2, C),
                         mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # corner order bit0=+z, bit1=+y, bit2=+x == row-major (x, y, z) flatten
    return out.reshape(idx8.shape[0], 8, C)


def _scatter_rows_to_grid(idx8: jnp.ndarray, contrib: jnp.ndarray,
                          gshape) -> jnp.ndarray:
    """Scatter-add per-corner contributions -> grid [C, X, Y, Z].

    idx8: [N, 8] flat corner voxel ids; contrib: [N, 8, C].

    A multi-channel scatter into [V, C<128] costs ~C x the scalar per-row
    floor on TPU (measured 59.9 ms vs 8.4 ms for C=12 vs C=1 at 925k rows:
    XLA lays [V, 12] out column-major, so each row update is 12 strided
    single-lane stores). Padding the update rows to the full 128-lane tile
    makes each update one contiguous (8,128) tile row at the scalar cost;
    the pallas transpose_slice consumer then drops the pad lanes and pins
    the scatter output row-major (custom-call boundary). By default the 8
    corner rows collapse further into ONE (2,2,2) window update per point
    (see `_use_window_scatter`)."""
    C = gshape[0]
    N = idx8.shape[0]
    V = int(np.prod(gshape[1:]))
    if _use_window_scatter():
        X, Y, Z = gshape[1:]
        starts = _starts_from_idx8(idx8, gshape)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3, 4), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2))
        P = _LANE if (C > 1 and _pin_layout()) else C
        up = contrib if P == C else jnp.pad(contrib, ((0, 0), (0, 0), (0, P - C)))
        if _scatter_barrier():
            # materialized updates: the round-3 800 ms window-scatter
            # regression was XLA serializing the scatter inside the fused
            # grad graph; a custom-call edge at its input isolates it
            up = pallas_layout.materialize(up.reshape(N, 8 * P)).reshape(up.shape)
        d4 = jax.lax.scatter_add(
            jnp.zeros((X, Y, Z, P), contrib.dtype), starts,
            up.reshape(N, 2, 2, 2, P), dn,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        if P == C:
            return _grid_from_rows(d4.reshape(V, C), gshape)
        return pallas_layout.transpose_slice(d4.reshape(V, P), C).reshape(gshape)
    idx = idx8.reshape(-1)
    flat_c = contrib.reshape(-1, C)
    if C > 1 and _pin_layout():
        up = jnp.pad(flat_c, ((0, 0), (0, _LANE - C)))
        if _scatter_barrier():
            up = pallas_layout.materialize(up)
        d = jnp.zeros((V, _LANE), contrib.dtype).at[idx].add(up)
        return pallas_layout.transpose_slice(d, C).reshape(gshape)
    d_flat = jnp.zeros((V, C), contrib.dtype).at[idx].add(flat_c)
    return _grid_from_rows(d_flat, gshape)


def normalize_coords(xyz: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray) -> jnp.ndarray:
    """World coords -> continuous voxel-index coords [0, D-1] per axis.

    align_corners=True convention: xyz_min maps to index 0, xyz_max to D-1.
    """
    return (xyz - xyz_min) / (xyz_max - xyz_min)


def _corner_data(grid: jnp.ndarray, xyz: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray):
    """Shared gather stage: 8 corner rows + interpolation weights + clamp masks.

    Returns (vals [N, 8, C], idx8 [N, 8], w=(wx, wy, wz) each [N, 1],
    m=(mx, my, mz) each [N, 1], scale [3]).
    Corner order: bit0 = +z, bit1 = +y, bit2 = +x.
    """
    C, X, Y, Z = grid.shape
    pts = xyz.reshape(-1, 3)
    u = normalize_coords(pts, xyz_min, xyz_max)
    scale = jnp.asarray([(X - 1), (Y - 1), (Z - 1)], dtype=grid.dtype) / (xyz_max - xyz_min)
    ix = u[:, 0] * (X - 1)
    iy = u[:, 1] * (Y - 1)
    iz = u[:, 2] * (Z - 1)

    def prep(i, D):
        inside = (i >= 0.0) & (i <= D - 1.0)
        i = jnp.clip(i, 0.0, D - 1.0)
        i0 = jnp.clip(jnp.floor(i), 0, D - 2).astype(jnp.int32)
        return i0, i - i0.astype(i.dtype), inside.astype(grid.dtype)

    x0, wx, mx = prep(ix, X)
    y0, wy, my = prep(iy, Y)
    z0, wz, mz = prep(iz, Z)
    base = (x0 * Y + y0) * Z + z0
    offs = jnp.asarray([0, 1, Z, Z + 1, Y * Z, Y * Z + 1, Y * Z + Z, Y * Z + Z + 1], jnp.int32)
    idx8 = base[:, None] + offs[None, :]  # [N, 8]
    flat = _rows_from_grid(grid)
    if _use_window_gather():
        vals = _gather_corners_window(flat, idx8, grid.shape)  # [N, 8, C]
    else:
        vals = flat[idx8]  # [N, 8, C] per-corner row gather
    return vals, idx8, (wx[:, None], wy[:, None], wz[:, None]), (mx[:, None], my[:, None], mz[:, None]), scale


def _corner_weights(w):
    """[N, 8] trilinear weights W_c and their sign patterns per axis."""
    wx, wy, wz = w
    ax = jnp.concatenate([1 - wx, wx], -1)  # [N, 2]
    ay = jnp.concatenate([1 - wy, wy], -1)
    az = jnp.concatenate([1 - wz, wz], -1)
    # corner c = (i, j, k) with i = c >> 2, j = (c >> 1) & 1, k = c & 1
    W = (ax[:, [0, 0, 0, 0, 1, 1, 1, 1]] * ay[:, [0, 0, 1, 1, 0, 0, 1, 1]]
         * az[:, [0, 1, 0, 1, 0, 1, 0, 1]])
    return W


_SIGN_X = jnp.asarray([-1, -1, -1, -1, 1, 1, 1, 1], jnp.float32)
_SIGN_Y = jnp.asarray([-1, -1, 1, 1, -1, -1, 1, 1], jnp.float32)
_SIGN_Z = jnp.asarray([-1, 1, -1, 1, -1, 1, -1, 1], jnp.float32)


def trilinear_sample(grid: jnp.ndarray, xyz: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate grid [C, X, Y, Z] at world points [..., 3].

    Returns [..., C]. Coordinates outside the box clamp to the border.
    Equivalent to the reference `grid_sampler` with its axis flip + grid_sample
    (`lib/voxurf_coarse.py:522-543`): world x indexes grid dim 0, etc.

    Uses a custom VJP: XLA's autodiff transpose of the batched gather lowers to
    a pathologically slow scatter on TPU (~50 ms for 116k x 12ch points); the
    hand-written backward is a single flat scatter-add (~0.02 ms). This is the
    TPU counterpart of the reference's hand-written CUDA backward kernels.
    """
    shape = xyz.shape[:-1]
    out = _trilinear_value(grid, xyz.reshape(-1, 3), xyz_min, xyz_max)
    return out.reshape(*shape, grid.shape[0])


@jax.custom_vjp
def _trilinear_value(grid, pts, xyz_min, xyz_max):
    vals, _, w, _, _ = _corner_data(grid, pts, xyz_min, xyz_max)
    W = _corner_weights(w)
    return jnp.einsum("nc,ncd->nd", W, vals)


def _trilinear_value_fwd(grid, pts, xyz_min, xyz_max):
    vals, idx8, w, m, scale = _corner_data(grid, pts, xyz_min, xyz_max)
    W = _corner_weights(w)
    out = jnp.einsum("nc,ncd->nd", W, vals)
    return out, (vals, idx8, w, m, scale, W, grid.shape)


def _trilinear_value_bwd(res, ct):
    vals, idx8, w, m, scale, W, gshape = res
    C = gshape[0]
    # d grid: scatter W_c * ct into the 8 corners (one flat scatter)
    contrib = W[..., None] * ct[:, None, :]  # [N, 8, C]
    d_grid = _scatter_rows_to_grid(idx8, contrib, gshape)
    # d pts: sum_c sign_axis * (bilinear weights of other axes) * vals . ct
    wx, wy, wz = w
    mx, my, mz = m
    v_dot_ct = jnp.einsum("ncd,nd->nc", vals, ct)  # [N, 8]
    ax = jnp.concatenate([1 - wx, wx], -1)
    ay = jnp.concatenate([1 - wy, wy], -1)
    az = jnp.concatenate([1 - wz, wz], -1)
    Wy_z = ay[:, [0, 0, 1, 1, 0, 0, 1, 1]] * az[:, [0, 1, 0, 1, 0, 1, 0, 1]]
    Wx_z = ax[:, [0, 0, 0, 0, 1, 1, 1, 1]] * az[:, [0, 1, 0, 1, 0, 1, 0, 1]]
    Wx_y = ax[:, [0, 0, 0, 0, 1, 1, 1, 1]] * ay[:, [0, 0, 1, 1, 0, 0, 1, 1]]
    # signs: +1 where the corner uses w, -1 where it uses (1 - w)
    sx_c = jnp.where(_SIGN_X > 0, 1.0, -1.0)
    gx = (v_dot_ct * Wy_z * sx_c).sum(-1, keepdims=True) * scale[0] * mx
    gy = (v_dot_ct * Wx_z * jnp.where(_SIGN_Y > 0, 1.0, -1.0)).sum(-1, keepdims=True) * scale[1] * my
    gz = (v_dot_ct * Wx_y * jnp.where(_SIGN_Z > 0, 1.0, -1.0)).sum(-1, keepdims=True) * scale[2] * mz
    d_pts = jnp.concatenate([gx, gy, gz], -1)
    # bounds cotangents are structural zeros, but built FROM `scale` (a
    # function of the bounds) so they inherit its vma type: under shard_map
    # with varying bounds (grid-TP), plain jnp.zeros would fail the custom
    # VJP's varying-axes check
    d_bounds = (scale * 0).astype(ct.dtype)
    return d_grid, d_pts, d_bounds, d_bounds


_trilinear_value.defvjp(_trilinear_value_fwd, _trilinear_value_bwd)


def _trilinear_sample_reference(grid: jnp.ndarray, xyz: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray) -> jnp.ndarray:
    """Plain-autodiff implementation kept for parity tests of the custom VJP."""
    C, X, Y, Z = grid.shape
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    u = normalize_coords(pts, xyz_min, xyz_max)
    # continuous index per axis, align_corners=True
    ix = u[:, 0] * (X - 1)
    iy = u[:, 1] * (Y - 1)
    iz = u[:, 2] * (Z - 1)

    def prep(i, D):
        i = jnp.clip(i, 0.0, D - 1.0)
        i0 = jnp.clip(jnp.floor(i), 0, D - 2).astype(jnp.int32)
        w = i - i0.astype(i.dtype)
        return i0, i0 + 1, w

    x0, x1, wx = prep(ix, X)
    y0, y1, wy = prep(iy, Y)
    z0, z1, wz = prep(iz, Z)

    # channels-last row gathers: each point reads a contiguous [C] row instead
    # of a column strided by X*Y*Z floats (the strided form is ~50x slower on
    # TPU for multi-channel feature grids)
    flat = grid.reshape(C, -1).T  # [X*Y*Z, C]

    def gather(xi, yi, zi):
        return flat[(xi * Y + yi) * Z + zi]  # [N, C]

    wx, wy, wz = wx[:, None], wy[:, None], wz[:, None]
    c000 = gather(x0, y0, z0)
    c001 = gather(x0, y0, z1)
    c010 = gather(x0, y1, z0)
    c011 = gather(x0, y1, z1)
    c100 = gather(x1, y0, z0)
    c101 = gather(x1, y0, z1)
    c110 = gather(x1, y1, z0)
    c111 = gather(x1, y1, z1)

    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    out = c0 * (1 - wx) + c1 * wx  # [N, C]
    return out.reshape(*shape, C)


def _trilinear_vg_reference(grid: jnp.ndarray, xyz: jnp.ndarray, xyz_min: jnp.ndarray,
                            xyz_max: jnp.ndarray):
    """Trilinear value AND its analytic spatial gradient in one pass.

    grid [C, X, Y, Z], xyz [..., 3] -> (value [..., C], grad [..., C, 3]).
    The gradient of trilinear interpolation w.r.t. position is piecewise
    bilinear and falls out of the same 8 gathers — no autodiff double-backward
    needed (this is the analytic form of what the reference obtains with
    `torch.autograd.grad(..., create_graph=True)`, `voxurf_coarse.py:982-984`).
    Outside the box the clamped coordinate has zero spatial gradient, matching
    border padding semantics.
    """
    C, X, Y, Z = grid.shape
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    u = normalize_coords(pts, xyz_min, xyz_max)
    scale = jnp.asarray([(X - 1), (Y - 1), (Z - 1)], dtype=grid.dtype) / (xyz_max - xyz_min)
    ix = u[:, 0] * (X - 1)
    iy = u[:, 1] * (Y - 1)
    iz = u[:, 2] * (Z - 1)

    def prep(i, D):
        inside = (i >= 0.0) & (i <= D - 1.0)
        i = jnp.clip(i, 0.0, D - 1.0)
        i0 = jnp.clip(jnp.floor(i), 0, D - 2).astype(jnp.int32)
        w = i - i0.astype(i.dtype)
        return i0, i0 + 1, w, inside.astype(grid.dtype)

    x0, x1, wx, mx = prep(ix, X)
    y0, y1, wy, my = prep(iy, Y)
    z0, z1, wz, mz = prep(iz, Z)
    flat = grid.reshape(C, -1).T  # channels-last row gathers (see trilinear_sample)

    def gather(xi, yi, zi):
        return flat[(xi * Y + yi) * Z + zi]  # [N, C]

    wx, wy, wz = wx[:, None], wy[:, None], wz[:, None]
    mx, my, mz = mx[:, None], my[:, None], mz[:, None]
    c000 = gather(x0, y0, z0); c001 = gather(x0, y0, z1)
    c010 = gather(x0, y1, z0); c011 = gather(x0, y1, z1)
    c100 = gather(x1, y0, z0); c101 = gather(x1, y0, z1)
    c110 = gather(x1, y1, z0); c111 = gather(x1, y1, z1)

    # value
    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    val = c0 * (1 - wx) + c1 * wx  # [N, C]

    # d/dx: difference along x of the (y, z)-interpolated values
    gx = (c1 - c0) * scale[0] * mx
    # d/dy
    g0 = c01 - c00
    g1 = c11 - c10
    gy = (g0 * (1 - wx) + g1 * wx) * scale[1] * my
    # d/dz
    d00 = c001 - c000; d01 = c011 - c010
    d10 = c101 - c100; d11 = c111 - c110
    dz0 = d00 * (1 - wy) + d01 * wy
    dz1 = d10 * (1 - wy) + d11 * wy
    gz = (dz0 * (1 - wx) + dz1 * wx) * scale[2] * mz

    grad = jnp.stack([gx, gy, gz], axis=-1)  # [N, C, 3]
    return val.reshape(*shape, C), grad.reshape(*shape, C, 3)




def trilinear_sample_with_grad(grid: jnp.ndarray, xyz: jnp.ndarray, xyz_min: jnp.ndarray,
                               xyz_max: jnp.ndarray):
    """Trilinear value AND analytic spatial gradient, custom-VJP fast path.

    grid [C, X, Y, Z], xyz [..., 3] -> (value [..., C], grad [..., C, 3]).
    See `trilinear_sample` for why the VJP is hand-written; the reference
    obtains the same quantities with `torch.autograd.grad(create_graph=True)`
    (`voxurf_coarse.py:982-984`). `_trilinear_vg_reference` is the
    plain-autodiff twin used by parity tests.
    """
    shape = xyz.shape[:-1]
    C = grid.shape[0]
    val, grad = _trilinear_vg(grid, xyz.reshape(-1, 3), xyz_min, xyz_max)
    return val.reshape(*shape, C), grad.reshape(*shape, C, 3)


def _vg_outputs(vals, w, m, scale):
    """(val [N, C], grad [N, C, 3]) from corner values + weights."""
    wx, wy, wz = w
    mx, my, mz = m
    ax = jnp.concatenate([1 - wx, wx], -1)
    ay = jnp.concatenate([1 - wy, wy], -1)
    az = jnp.concatenate([1 - wz, wz], -1)
    AX = ax[:, [0, 0, 0, 0, 1, 1, 1, 1]]
    AY = ay[:, [0, 0, 1, 1, 0, 0, 1, 1]]
    AZ = az[:, [0, 1, 0, 1, 0, 1, 0, 1]]
    W = AX * AY * AZ
    val = jnp.einsum("nc,ncd->nd", W, vals)
    gx = jnp.einsum("nc,ncd->nd", _SIGN_X * AY * AZ, vals) * (scale[0] * mx)
    gy = jnp.einsum("nc,ncd->nd", _SIGN_Y * AX * AZ, vals) * (scale[1] * my)
    gz = jnp.einsum("nc,ncd->nd", _SIGN_Z * AX * AY, vals) * (scale[2] * mz)
    return val, jnp.stack([gx, gy, gz], axis=-1)


@jax.custom_vjp
def _trilinear_vg(grid, pts, xyz_min, xyz_max):
    vals, _, w, m, scale = _corner_data(grid, pts, xyz_min, xyz_max)
    return _vg_outputs(vals, w, m, scale)


def _trilinear_vg_fwd(grid, pts, xyz_min, xyz_max):
    vals, idx8, w, m, scale = _corner_data(grid, pts, xyz_min, xyz_max)
    out = _vg_outputs(vals, w, m, scale)
    return out, (vals, idx8, w, m, scale, grid.shape)


def _trilinear_vg_bwd(res, cts):
    vals, idx8, w, m, scale, gshape = res
    ct_v, ct_g = cts  # [N, C], [N, C, 3]
    C = gshape[0]
    wx, wy, wz = w
    mx, my, mz = m
    ax = jnp.concatenate([1 - wx, wx], -1)
    ay = jnp.concatenate([1 - wy, wy], -1)
    az = jnp.concatenate([1 - wz, wz], -1)
    AX = ax[:, [0, 0, 0, 0, 1, 1, 1, 1]]
    AY = ay[:, [0, 0, 1, 1, 0, 0, 1, 1]]
    AZ = az[:, [0, 1, 0, 1, 0, 1, 0, 1]]
    sxm = scale[0] * mx
    sym = scale[1] * my
    szm = scale[2] * mz
    ct_gx, ct_gy, ct_gz = ct_g[..., 0], ct_g[..., 1], ct_g[..., 2]

    # --- d grid: per-corner coefficient of each channel cotangent ---
    # outputs are linear in corner values with coefficients
    # val: W_c, gx: sign_x*AY*AZ*sxm, gy: sign_y*AX*AZ*sym, gz: sign_z*AX*AY*szm
    contrib = (
        (AX * AY * AZ)[..., None] * ct_v[:, None, :]
        + (_SIGN_X * AY * AZ * sxm)[..., None] * ct_gx[:, None, :]
        + (_SIGN_Y * AX * AZ * sym)[..., None] * ct_gy[:, None, :]
        + (_SIGN_Z * AX * AY * szm)[..., None] * ct_gz[:, None, :]
    )  # [N, 8, C]
    d_grid = _scatter_rows_to_grid(idx8, contrib, gshape)

    # --- d pts: differentiate the coefficient matrices w.r.t. wx/wy/wz ---
    v_ct_v = jnp.einsum("ncd,nd->nc", vals, ct_v)    # [N, 8]
    v_ct_gx = jnp.einsum("ncd,nd->nc", vals, ct_gx)
    v_ct_gy = jnp.einsum("ncd,nd->nc", vals, ct_gy)
    v_ct_gz = jnp.einsum("ncd,nd->nc", vals, ct_gz)
    # d val/d wx = sign_x*AY*AZ; d gy/d wx = sign_y*sign_x*AZ*sym; d gz/d wx = sign_z*sign_x*AY*szm
    d_wx = ((v_ct_v * _SIGN_X * AY * AZ).sum(-1, keepdims=True)
            + (v_ct_gy * _SIGN_Y * _SIGN_X * AZ).sum(-1, keepdims=True) * sym
            + (v_ct_gz * _SIGN_Z * _SIGN_X * AY).sum(-1, keepdims=True) * szm)
    d_wy = ((v_ct_v * _SIGN_Y * AX * AZ).sum(-1, keepdims=True)
            + (v_ct_gx * _SIGN_X * _SIGN_Y * AZ).sum(-1, keepdims=True) * sxm
            + (v_ct_gz * _SIGN_Z * _SIGN_Y * AX).sum(-1, keepdims=True) * szm)
    d_wz = ((v_ct_v * _SIGN_Z * AX * AY).sum(-1, keepdims=True)
            + (v_ct_gx * _SIGN_X * _SIGN_Z * AY).sum(-1, keepdims=True) * sxm
            + (v_ct_gy * _SIGN_Y * _SIGN_Z * AX).sum(-1, keepdims=True) * sym)
    d_pts = jnp.concatenate([d_wx * sxm, d_wy * sym, d_wz * szm], -1)
    # structural zeros that inherit `scale`'s vma type (see _trilinear_value_bwd)
    d_bounds = (scale * 0).astype(ct_v.dtype)
    return d_grid, d_pts, d_bounds, d_bounds


_trilinear_vg.defvjp(_trilinear_vg_fwd, _trilinear_vg_bwd)


def resize_trilinear(grid: jnp.ndarray, new_size: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear grid resize [C, X, Y, Z] -> [C, *new_size] (align_corners=True).

    Replaces `F.interpolate(..., mode='trilinear', align_corners=True)` used by
    `scale_volume_grid` (`lib/grid.py:60-65`).
    """
    C, X, Y, Z = grid.shape
    nx, ny, nz = new_size
    gx = jnp.linspace(0.0, X - 1.0, nx)
    gy = jnp.linspace(0.0, Y - 1.0, ny)
    gz = jnp.linspace(0.0, Z - 1.0, nz)
    GX, GY, GZ = jnp.meshgrid(gx, gy, gz, indexing="ij")
    # reuse trilinear_sample with index-space "world" bounds
    pts = jnp.stack([GX, GY, GZ], axis=-1)
    out = trilinear_sample(
        grid,
        pts,
        jnp.zeros(3, dtype=grid.dtype),
        # size-1 source dims have zero extent; clamp to avoid 0/0 in the
        # coordinate normalization (all query coords are 0 there anyway)
        jnp.array([max(X - 1.0, 1.0), max(Y - 1.0, 1.0), max(Z - 1.0, 1.0)],
                  dtype=grid.dtype),
    )
    return jnp.moveaxis(out, -1, 0)


def total_variation(v: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean absolute difference over the 3 spatial axes of [C, X, Y, Z].

    Matches reference `total_variation` (`lib/voxurf_coarse.py:1298-1313`):
    (sum tv_x + sum tv_y + sum tv_z) / 3 / (#mask or #elements).
    """
    tv_x = jnp.abs(v[:, 1:, :, :] - v[:, :-1, :, :])
    tv_y = jnp.abs(v[:, :, 1:, :] - v[:, :, :-1, :])
    tv_z = jnp.abs(v[:, :, :, 1:] - v[:, :, :, :-1])
    if mask is not None:
        mask = mask.astype(v.dtype)
        tv_x = tv_x * (mask[:, 1:] * mask[:, :-1])
        tv_y = tv_y * (mask[:, :, 1:] * mask[:, :, :-1])
        tv_z = tv_z * (mask[:, :, :, 1:] * mask[:, :, :, :-1])
        denom = mask.sum()
    else:
        denom = jnp.asarray(v.size, dtype=v.dtype)
    return (tv_x.sum() + tv_y.sum() + tv_z.sum()) / 3.0 / denom


def sdf_gradient_grid(sdf: jnp.ndarray, voxel_size: jnp.ndarray) -> jnp.ndarray:
    """Central-difference spatial gradient of an SDF grid [1, X, Y, Z] -> [3, X, Y, Z].

    Mirrors `neus_sdf_gradient(mode='interpolate')` (`lib/voxurf_coarse.py:463-467`),
    including zero gradients on the boundary slices.
    """
    g = jnp.zeros((3,) + sdf.shape[1:], dtype=sdf.dtype)
    g = g.at[0, 1:-1, :, :].set((sdf[0, 2:, :, :] - sdf[0, :-2, :, :]) / 2.0 / voxel_size)
    g = g.at[1, :, 1:-1, :].set((sdf[0, :, 2:, :] - sdf[0, :, :-2, :]) / 2.0 / voxel_size)
    g = g.at[2, :, :, 1:-1].set((sdf[0, :, :, 2:] - sdf[0, :, :, :-2]) / 2.0 / voxel_size)
    return g


def gaussian_kernel_3d(ksize: int, sigma: float) -> jnp.ndarray:
    """Normalized [k, k, k] Gaussian kernel (reference `_gaussian_3dconv`)."""
    r = jnp.arange(-(ksize // 2), ksize // 2 + 1, dtype=jnp.float32)
    xx, yy, zz = jnp.meshgrid(r, r, r, indexing="ij")
    k = jnp.exp(-(xx**2 + yy**2 + zz**2) / (2.0 * sigma**2))
    return k / k.sum()


def conv3d_replicate(grid: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3D conv with replicate padding on [C, X, Y, Z]."""
    k = kernel.shape[0]
    p = k // 2
    padded = jnp.pad(grid, ((0, 0), (p, p), (p, p), (p, p)), mode="edge")
    lhs = padded[None]  # [1, C, X', Y', Z']
    C = grid.shape[0]
    rhs = jnp.broadcast_to(kernel[None, None], (C, 1, k, k, k))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), feature_group_count=C,
    )
    return out[0]


def conv3d_separable_replicate(grid: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise smoothing on [C, X, Y, Z]: the 3D kernel is the
    outer product ``k1d (x) k1d (x) k1d`` (true for the binomial TV-smooth
    and Gaussian kernels used here), applied as three 1-D passes of
    pad(edge)+shifted adds. Avoids XLA's 3-D conv lowering entirely — a
    depthwise NCDHW conv3d dominates the early-phase step cost, while this
    form is a handful of fused elementwise adds."""
    k = int(k1d.shape[0])
    p = k // 2
    out = grid
    for axis in (1, 2, 3):
        pad_width = [(0, 0)] * 4
        pad_width[axis] = (p, p)
        padded = jnp.pad(out, pad_width, mode="edge")
        acc = None
        for i in range(k):
            idx = [slice(None)] * 4
            idx[axis] = slice(i, i + out.shape[axis])
            term = k1d[i] * padded[tuple(idx)]
            acc = term if acc is None else acc + term
        out = acc
    return out


def binomial_kernel_1d() -> jnp.ndarray:
    """[1, 2, 1]/4 — the separable factor of the reference's 3x3x3 binomial
    TV-smooth kernel (`init_gradient_conv`, `voxurf_coarse.py:233-244`)."""
    return jnp.asarray([0.25, 0.5, 0.25], jnp.float32)


def gaussian_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    """Normalized 1-D Gaussian — separable factor of `gaussian_kernel_3d`."""
    r = jnp.arange(-(ksize // 2), ksize // 2 + 1, dtype=jnp.float32)
    k = jnp.exp(-(r**2) / (2.0 * sigma**2))
    return k / k.sum()


def smooth_grad_tv(sdf_grad: jnp.ndarray, smooth_kernel: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """||smooth(grad).detach() - grad||^2 regularizer.

    Mirrors `density_total_variation(smooth_grad_tv=...)`
    (`lib/voxurf_coarse.py:407-422`) with the smoothing conv treated as
    constant (stop_gradient), matching the reference `.detach()`.
    `smooth_kernel` may be the separable 1-D factor [k] (fast path) or a
    full [k, k, k] kernel.
    """
    if smooth_kernel.ndim == 1:
        smoothed = jax.lax.stop_gradient(conv3d_separable_replicate(sdf_grad, smooth_kernel))
    else:
        smoothed = jax.lax.stop_gradient(conv3d_replicate(sdf_grad, smooth_kernel))
    err = (smoothed - sdf_grad) ** 2
    if mask is not None:
        err = err * mask.astype(err.dtype)
        return err.sum() / jnp.maximum(mask.sum() * 3.0, 1.0)
    return err.mean()
