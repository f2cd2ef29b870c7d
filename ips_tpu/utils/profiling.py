"""Efficiency tracking: per-step wall time + peak device memory.

Parity with the reference's CUDA-event tracker
(reference training/iterative.py:116,128-132,165-171,180-189): when
``conf.track_efficiency`` is on, time each (selection + optimizer step)
pair, and at ``conf.track_epoch`` print the mean step time and the peak
allocated device bytes, then stop the run.

TPU-native: timing brackets `jax.block_until_ready` (XLA dispatch is
async), memory comes from ``device.memory_stats()['peak_bytes_in_use']``,
and `jax.profiler` traces can be captured for Perfetto/TensorBoard.
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import jax


def host_sync(outputs) -> None:
    """True device synchronization: read one value back to the host —
    experimental/remote backends have been observed returning early from
    jax.block_until_ready."""
    leaf = jax.tree_util.tree_leaves(outputs)[0]
    float(jax.numpy.ravel(leaf)[0])


def device_peak_bytes(device=None) -> Optional[int]:
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("peak_bytes_in_use")


class EfficiencyTracker:
    def __init__(self, conf):
        self.enabled = bool(conf.track_efficiency)
        self.track_epoch = conf.track_epoch
        self.times: List[float] = []
        self._t0 = 0.0

    def start(self):
        if self.enabled:
            self._t0 = time.perf_counter()

    def stop(self, outputs, epoch: int, data_it: int, is_last_batch: bool):
        """Record elapsed ms for one optimizer batch (sync on outputs)."""
        if not self.enabled:
            return
        host_sync(outputs)
        elapsed_ms = (time.perf_counter() - self._t0) * 1000.0
        if epoch == self.track_epoch and data_it > 0 and not is_last_batch:
            self.times.append(elapsed_ms)
            print("time: ", elapsed_ms, flush=True)

    def finish_epoch(self, epoch: int):
        """Print summary and terminate (reference training/iterative.py:180-189)."""
        if not self.enabled or epoch != self.track_epoch:
            return
        import numpy as np
        print("avg. time: ", float(np.mean(self.times)) if self.times
              else float("nan"), flush=True)
        peak = device_peak_bytes()
        if peak is not None:
            print(f"Peak memory requirement: {peak / 1024 ** 3:.4f} GB",
                  flush=True)
        sys.exit(0)
