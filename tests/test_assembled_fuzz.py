"""Dispatch-group equality fuzz for the epoch drivers.

Broadens the fixed-shape update-sequence tests in tests/test_train_loop.py:
for each drawn (B, B_seq, n_samples, K) the grouped driver
(steps_per_dispatch=K — fused, assembled, and their tail fallbacks) must
produce the SAME per-epoch losses and final params as the ungrouped K=1
schedule, across edge cases: B_seq=1 (the reference camelyon shape,
training/iterative.py:103-231), ragged loader tails, partial optimizer
batches, and K exceeding the number of available step groups.
"""

import jax
import numpy as np
import pytest

from ips_tpu.data.loader import DataLoader
from ips_tpu.train.loop import train_one_epoch
from ips_tpu.train.metrics import MetricsLogger
from ips_tpu.train.steps import IPSTrainer
from test_train_loop import SignalPatches

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



def _conf(B, B_seq, **kw):
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B_seq, n_epoch_warmup=1, lr=3e-4, wd=0.01,
        n_class=4, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=2,
        N=10, M=4, I=3, patch_size=[16, 16], patch_stride=[16, 16],
        use_pos=False, H=2, D=128, D_k=16, D_v=16, D_inner=128,
        compute_dtype="float32", donate_buffers=False, seed=0,
        tasks={
            "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task1": {"id": 1, "name": "multi", "act_fn": "sigmoid",
                      "metric": "multilabel_accuracy"},
        }, **kw))


def _run(conf, n_samples):
    data = SignalPatches(conf, n_samples=n_samples)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True,
                        seed=conf.seed)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    n_logged = {t: len(v) for t, v in log.y_trues.items()}
    log.compute_metric()
    return trainer, log, n_logged


# (B, B_seq, n_samples, K) — chosen to hit: B_seq=1, a partial optimizer
# batch, a ragged loader tail, fused B_seq==B with tail, K > n_groups
CASES = [
    (4, 1, 10, 2),   # B_seq=1 + partial optimizer tail (2 full + 2 rows)
    (6, 3, 15, 2),   # assembled, half-full final optimizer batch
    (4, 2, 13, 3),   # ragged loader tail (last loader batch is 1 row)
    (2, 2, 7, 2),    # fused path, odd sample tail
    (8, 4, 12, 4),   # K exceeds the number of step groups
]


@pytest.mark.parametrize("B,B_seq,n,K", CASES)
def test_grouped_matches_ungrouped(B, B_seq, n, K):
    t1, log1, n1 = _run(_conf(B, B_seq), n)
    tK, logK, nK = _run(_conf(B, B_seq, steps_per_dispatch=K), n)

    for task in ("majority", "multi"):
        np.testing.assert_allclose(
            np.asarray(log1.losses_epoch[task], np.float64),
            np.asarray(logK.losses_epoch[task], np.float64), rtol=1e-5)
        # every sample logged exactly once in both schedules
        assert n1[task] == nK[task] == n
        np.testing.assert_allclose(log1.metrics[task], logK.metrics[task],
                                   rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(tK.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
