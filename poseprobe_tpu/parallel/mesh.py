"""Device-mesh data parallelism: ray sharding over ICI.

The reference has zero distributed code (single GPU by construction,
`lib/bg_nerf/train_settings/default_config.py:25`). Here multi-chip scaling is
first-class: the per-step ray batches (object rays, scene pixels, match rays,
depth-consistency rays) are sharded over a 1-D ``('data',)`` mesh with
`jax.lax.with_sharding_constraint`; parameters stay replicated, so GSPMD
inserts the psum gradient all-reduce over ICI automatically — no NCCL-style
hand-written collectives.

Grids are small enough (96^3 x 13ch ~ 46 MB fp32) to replicate on every v5e
chip; grid (tensor-parallel) sharding pays above ~160^3 and lives in
`parallel/grid_tp.py` (Z-sharded grids + halo exchange on a 2-D
('data', 'grid') mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rays(x: jnp.ndarray, mesh: Mesh | None, axis: int = 0) -> jnp.ndarray:
    """Constrain a ray-batch array to be sharded along `axis` of the data mesh.

    A no-op when mesh is None (single-chip) — the trainer calls this
    unconditionally so the same program runs 1-chip and N-chip.
    """
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    if isinstance(x, jax.core.Tracer):  # inside jit: a layout constraint
        return jax.lax.with_sharding_constraint(x, sharding)
    # eager (e.g. chunked eval renders): place the committed array so the
    # jitted callee's GSPMD partitioning picks the sharding up from the input;
    # a ragged tail chunk stays unsharded (NamedSharding needs divisibility)
    if x.shape[axis] % mesh.devices.size != 0:
        return x
    return jax.device_put(x, sharding)


def replicated(x, mesh: Mesh | None):
    if mesh is None:
        return x
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
