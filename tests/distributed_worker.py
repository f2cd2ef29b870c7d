"""Worker for the 2-process jax.distributed smoke test (not a test file).

Run as: python tests/distributed_worker.py <process_id> <port>
Exercises: distributed.initialize (gloo CPU collectives), a global mesh
spanning both processes, a process-sharded DataLoader, global-batch
assembly, and one cross-process reduction that every process must agree
on. The reference has no distributed layer at all (SURVEY.md §2.3).
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from ips_tpu.parallel.distributed import (global_mesh, initialize,
                                          make_global_batch)


class Rows:
    """8 deterministic rows: x[i] = (i, i, i), y[i] = i."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "y": np.int32(i)}


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    initialize(f"localhost:{port}", num_processes=2, process_id=pid,
               cpu_collectives="gloo")
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ips_tpu.data.loader import DataLoader

    mesh = global_mesh()           # data axis over all processes' devices
    n_global = len(jax.devices())
    assert n_global == 2 * len(jax.local_devices())

    loader = DataLoader(Rows(), batch_size=4, shuffle=False,
                        process_index=pid, process_count=2)
    assert len(loader) == 2
    batches = list(loader)
    # Each process holds only its contiguous half of every global batch.
    np.testing.assert_array_equal(batches[0]["y"], [2 * pid, 2 * pid + 1])
    np.testing.assert_array_equal(batches[1]["y"],
                                  [4 + 2 * pid, 5 + 2 * pid])

    g = make_global_batch(mesh, batches[0], 4)
    assert g["x"].shape == (4, 3)
    total = jax.jit(lambda t: jnp.sum(t["x"]) + jnp.sum(t["y"]),
                    out_shardings=NamedSharding(mesh, P()))(g)
    total = float(total)
    expected = float(sum(3 * i for i in range(4)) + sum(range(4)))
    assert total == expected, (total, expected)
    print(f"DIST_OK pid={pid} total={total}", flush=True)


if __name__ == "__main__":
    main()
