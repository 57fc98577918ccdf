"""Multi-host (DCN) initialisation and cross-slice mesh construction.

The reference is single-GPU by construction; this module provides the
multi-host entry points for pod-scale runs:

* `init_distributed()` — `jax.distributed.initialize` wrapper (coordinator
  discovery via env or args); call once per process before any jax op.
* `make_global_mesh()` — a 1-D ray-data-parallel mesh over every chip in the
  job. Ray DP only needs a gradient psum, which XLA routes over ICI within a
  slice and DCN across slices automatically; the grids/MLPs are replicated so
  no cross-slice tensor traffic happens outside the all-reduce.
* `is_primary()` — host-0 check for logging/checkpoint writers.
"""
from __future__ import annotations

import os


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return  # single-process run; nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh():
    from .mesh import make_mesh

    import jax

    return make_mesh(jax.devices())


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
