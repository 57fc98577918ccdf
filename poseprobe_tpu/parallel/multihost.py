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
                     process_id: int | None = None) -> bool:
    """Initialize the multi-process runtime; returns True if initialized.

    Argument resolution order: explicit args > JAX_* env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) > TPU-pod
    auto-discovery (args all None). Single-process (num_processes <= 1) is a
    no-op so the same entrypoint runs on a laptop and a pod.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is None or num_processes <= 1:
        return False  # single-process run; nothing to initialize
    if num_processes > 1 and process_id is None:
        raise ValueError("multi-process init needs process_id "
                         "(arg or $JAX_PROCESS_ID)")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh():
    from .mesh import make_mesh

    import jax

    return make_mesh(jax.devices())


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
