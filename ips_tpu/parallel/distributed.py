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
    # Note: the training loop runs a few eager ops on global arrays between
    # jitted steps (stacking prepared batches for steps_per_dispatch
    # groups); all processes execute them in lockstep, which jax >= 0.5
    # permits without the old jax_spmd_mode flag.
    _initialized = True


def initialize_from_config(conf) -> None:
    """CLI entry: wire the config's multihost knobs into initialize().

    Called by ips_tpu.main.run BEFORE any other jax use when
    conf.multihost is set; a no-op single-process run otherwise.
    """
    if not getattr(conf, "multihost", False):
        return
    initialize(conf.coordinator_address or None,
               conf.num_processes or None,
               conf.process_id if conf.process_id >= 0 else None,
               conf.cpu_collectives or None)


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


def host_allgather(tree):
    """Concatenate per-process host arrays along dim 0 (process order).

    Identity in single-process runs. Used to give every process the GLOBAL
    label/weight rows for metric logging, matching the replicated preds the
    jitted steps return under multihost.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def put_replicated_global(mesh, tree):
    """Replicate host values over a (possibly multi-host) mesh.

    Every process must pass the SAME values (they are seeded identically in
    the training loop). jax.make_array_from_callback places only the
    addressable shards on each process.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree.map(put, tree)


def shard_batch_global(mesh, local_tree, patch_dim=None):
    """Multi-process analog of parallel.mesh.shard_batch: each process
    passes its LOCAL batch rows (loaded by a process-sharded DataLoader);
    the result is a global jax.Array of process_count * local rows sharded
    over the mesh's data axis (and patch_dim over patch). No cross-host
    data transfer — each host's rows stay on its devices."""
    import numpy as np
    from jax.sharding import NamedSharding

    from ips_tpu.parallel.mesh import batch_spec

    n_proc = jax.process_count()

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        spec = batch_spec(x.ndim, patch_dim if x.ndim > 1 else None)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sharding, x, (x.shape[0] * n_proc,) + x.shape[1:])

    return jax.tree.map(put, local_tree)


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
