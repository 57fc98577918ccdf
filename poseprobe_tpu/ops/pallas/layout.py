"""Pallas TPU helper: 2D transpose that PINS its operand/result layouts.

Why this exists: the trilinear-sampling VJPs (ops/grid.py) scatter-add
per-point [C]-channel rows into a flat [V, C] buffer (the TPU counterpart of
the reference's atomicAdd backward, `lib/cuda/render_utils_kernel.cu`). XLA's
layout assignment is free to give the scatter output the column-major {0,1}
layout so the downstream `d_flat.T.reshape(grid_shape)` becomes a bitcast —
but that turns every one of the ~500k per-point row updates into C strided
single-lane stores (profiled: 22.2 ms/step for the 12-channel k0 scatter on
a 96^3 grid, >1/3 of the whole early-phase train step). An
`optimization_barrier` does NOT constrain layouts, so the round-2 fix rotted.

A `pallas_call` is a custom call: XLA MUST materialize its operands in the
default row-major layout. Routing the scatter result through this kernel
therefore forces the scatter to produce row-major [V, C] — one contiguous
lane-aligned row per update — and the kernel performs the transpose to
channel-major [C, V] explicitly (a streaming VMEM pass, ~0.1 ms for 42 MB),
after which `.reshape(C, X, Y, Z)` is free. The same trick pins the forward
gather operand (`[C, V] -> [V, C]` rows) so each point reads one contiguous
row of channels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048  # elements of the long axis per grid step


def _t_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def _ts_kernel_factory(C: int):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, :C].T

    return kernel


def transpose_slice(x: jnp.ndarray, C: int, tile: int = _TILE,
                    interpret: bool | None = None) -> jnp.ndarray:
    """[V, P] -> [C, V]: keep the first C of P columns, transposed.

    Consumer side of the lane-padded scatter trick: a multi-channel
    scatter-add into [V, C<128] runs at C x the scalar per-row cost (each
    row update is C strided single-lane stores in the {0,1} layout XLA
    picks, and the row-major layout would pad the lane dim to 128 anyway —
    measured 59.9 ms vs 8.4 ms for C=12 vs C=1 at 925k rows). Scattering
    into [V, 128] instead makes each update one contiguous (8,128) tile row
    at the scalar cost; this kernel then drops the padding lanes and emits
    the channel-major [C, V] the grid layout wants, pinning the scatter
    output row-major at the custom-call boundary."""
    if interpret is None:
        from .fused_mlp import on_tpu

        interpret = not on_tpu()
    V, P = x.shape
    return pl.pallas_call(
        _ts_kernel_factory(C),
        out_shape=jax.ShapeDtypeStruct((C, V), x.dtype),
        grid=(pl.cdiv(V, tile),),
        in_specs=[pl.BlockSpec((tile, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def materialize(x: jnp.ndarray, tile: int = _TILE,
                interpret: bool | None = None) -> jnp.ndarray:
    """Identity through a pallas custom call: a FUSION BARRIER.

    `optimization_barrier` does not stop XLA from fusing producers and
    consumers into one loop fusion (and does not constrain layouts); a
    custom call does both — the operand must be materialized row-major in
    HBM and the result is a fresh buffer. Use to break a pathological
    mega-fusion (e.g. the early-phase object-branch grad fusion) at a
    chosen edge, at the cost of one HBM round trip of `x`.

    Accepts any rank; blocks over the leading axis of a 2-D view.
    """
    if interpret is None:
        from .fused_mlp import on_tpu

        interpret = not on_tpu()
    shape = x.shape
    x2 = x.reshape(shape[0], -1) if x.ndim != 2 else x
    A, B = x2.shape

    def _id_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    out = pl.pallas_call(
        _id_kernel,
        out_shape=jax.ShapeDtypeStruct((A, B), x2.dtype),
        grid=(pl.cdiv(A, tile),),
        in_specs=[pl.BlockSpec((tile, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    return out.reshape(shape)


def transpose2d(x: jnp.ndarray, tile: int = _TILE,
                interpret: bool | None = None) -> jnp.ndarray:
    """[A, B] -> [B, A] with both sides in default (row-major) layout.

    Blocks along the longer axis; non-divisible sizes rely on pallas block
    masking (out-of-range reads are zero-padded, writes dropped).
    `interpret=None` auto-selects interpret mode off-TPU (CPU tests).
    """
    if interpret is None:
        from .fused_mlp import on_tpu

        interpret = not on_tpu()
    A, B = x.shape
    if A >= B:
        grid = (pl.cdiv(A, tile),)
        in_spec = pl.BlockSpec((tile, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((B, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        grid = (pl.cdiv(B, tile),)
        in_spec = pl.BlockSpec((A, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tile, A), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _t_kernel,
        out_shape=jax.ShapeDtypeStruct((B, A), x.dtype),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(x)
