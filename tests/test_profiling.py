"""EfficiencyTracker: reference flag semantics (SURVEY §2.1 #9).

Reference behavior (training/iterative.py:116,128-132,165-189): with
track_efficiency on, per-step times print during track_epoch (skipping
the first and last batch), and at the end of track_epoch the mean time
prints and the run exits.
"""

import jax.numpy as jnp
import pytest

from ips_tpu.utils.profiling import EfficiencyTracker, device_peak_bytes


class _Conf:
    def __init__(self, enabled, track_epoch=0):
        self.track_efficiency = enabled
        self.track_epoch = track_epoch


def test_disabled_is_noop():
    tr = EfficiencyTracker(_Conf(False))
    tr.start()
    tr.stop(jnp.zeros(1), epoch=0, data_it=1, is_last_batch=False)
    tr.finish_epoch(0)          # must NOT exit
    assert tr.times == []


def test_tracks_and_exits_at_track_epoch(capsys):
    tr = EfficiencyTracker(_Conf(True, track_epoch=1))
    out = jnp.zeros(1)
    # epoch 0 is not the tracked epoch: timed but not recorded
    tr.start()
    tr.stop(out, epoch=0, data_it=1, is_last_batch=False)
    assert tr.times == []
    tr.finish_epoch(0)          # not the tracked epoch -> returns

    # tracked epoch: first (data_it=0) and last batches are skipped,
    # middle batches recorded (reference iterative.py:128-132)
    for it, last in [(0, False), (1, False), (2, False), (3, True)]:
        tr.start()
        tr.stop(out, epoch=1, data_it=it, is_last_batch=last)
    assert len(tr.times) == 2
    with pytest.raises(SystemExit):
        tr.finish_epoch(1)
    printed = capsys.readouterr().out
    assert "avg. time:" in printed


def test_device_peak_bytes_shape():
    peak = device_peak_bytes()
    assert peak is None or peak > 0
