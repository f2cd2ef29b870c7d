"""Multi-host initialization + mesh spanning hosts.

The reference is single-process/single-GPU (reference main.py:19-20);
this module is the multi-host entry point for pod slices: call
``initialize()`` once per process before any jax op, then build a mesh
over ``jax.devices()`` (all hosts' devices). XLA routes collectives over
ICI within a slice and DCN across slices.

On TPU pods the coordinator/process_id/num_processes are auto-detected
from the environment; arguments are only needed for manual (e.g. CPU
fleet) setups.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: Optional[str] = None) -> None:
    """Idempotent jax.distributed.initialize wrapper.

    MUST run before any other jax call in the process (touching the
    backend first — even jax.process_count() — would make distributed
    init impossible), so no jax API is consulted in the guard.

    cpu_collectives: 'gloo' (or 'mpi') enables cross-process collectives
    on the CPU backend — required for multi-process CPU fleets and the
    2-process smoke test (tests/test_distributed.py); TPU pods ignore it.
    """
    global _initialized
    if _initialized:
        return
    env_configured = (coordinator_address is not None
                      or os.environ.get("JAX_COORDINATOR_ADDRESS")
                      or os.environ.get("COORDINATOR_ADDRESS")
                      or os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not env_configured:
        _initialized = True   # single-process run; nothing to do
        return
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    _initialized = True


def global_mesh(data: Optional[int] = None, patch: int = 1):
    """Mesh over every device of every host; data axis defaults to
    len(all devices) // patch."""
    from ips_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    if data is None:
        data = n // patch
    return make_mesh(data, patch, devices=jax.devices())


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_global_batch(mesh, local_tree, global_rows: int):
    """Assemble per-process local batch slices into global jax.Arrays.

    Each process passes its own rows (loaded by a process-sharded
    DataLoader); the result is a single global array of ``global_rows``
    sharded over the mesh's ``data`` axis — no cross-host data transfer,
    each host's rows stay on its devices.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ips_tpu.parallel.mesh import DATA_AXIS

    def put(x):
        if x is None:
            return None
        import numpy as np
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS,
                                         *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(
            sharding, x, (global_rows,) + x.shape[1:])

    return jax.tree.map(put, local_tree)
