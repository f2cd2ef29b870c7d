"""Two-process jax.distributed smoke test on CPU (VERDICT round-1 item 7).

Launches two real Python processes that initialize jax.distributed
against a localhost coordinator, build a global mesh, load disjoint
batch slices through the process-sharded DataLoader, and agree on one
cross-process reduction. Catches the init-ordering class of bugs the
docstring of parallel/distributed.py warns about.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow  # spawns two jax.distributed processes
def test_two_process_init_mesh_and_reduction():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen([sys.executable, WORKER, str(i), str(port)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    totals = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("DIST_OK")]
        assert lines, out[-2000:]
        totals.append(float(lines[0].split("total=")[1]))
    assert totals[0] == totals[1] == 24.0


class TestProcessShardedLoader:
    """Single-process unit coverage of the loader's sharding contract."""

    class Rows:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"y": np.int32(i)}

    def test_slices_are_disjoint_and_aligned(self):
        from ips_tpu.data.loader import DataLoader
        per_proc = [list(DataLoader(self.Rows(), batch_size=4, shuffle=True,
                                    seed=7, process_index=i,
                                    process_count=2))
                    for i in range(2)]
        # same number of (global) batches on both processes; ragged tail
        # dropped
        assert len(per_proc[0]) == len(per_proc[1]) == 2
        for b0, b1 in zip(*per_proc):
            got = np.concatenate([b0["y"], b1["y"]])
            assert len(set(got.tolist())) == 4  # disjoint halves
        # identical shuffle order across processes: re-run with same seed
        again = list(DataLoader(self.Rows(), batch_size=4, shuffle=True,
                                seed=7, process_index=0, process_count=2))
        for b, a in zip(per_proc[0], again):
            np.testing.assert_array_equal(b["y"], a["y"])

    def test_rejects_bad_config(self):
        from ips_tpu.data.loader import DataLoader
        with pytest.raises(ValueError, match="divisible"):
            DataLoader(self.Rows(), batch_size=5, process_count=2)
        with pytest.raises(ValueError, match="out of range"):
            DataLoader(self.Rows(), batch_size=4, process_index=2,
                       process_count=2)
