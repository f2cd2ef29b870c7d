"""Metrics + LR schedule parity tests."""

import math

import numpy as np
import pytest
from sklearn.metrics import accuracy_score, roc_auc_score

from ips_tpu.config import TaskConfig
from ips_tpu.train.metrics import MetricsLogger, _auc
from ips_tpu.train.schedule import warmup_cosine_lr


class TestSchedule:
    """Golden values from the reference formula (utils/utils.py:14-31)."""

    def test_warmup_linear(self):
        # max_lr * step / warmup_steps
        assert warmup_cosine_lr(0, 10, 100, 10, 1.0) == 0.0
        assert warmup_cosine_lr(50, 10, 100, 10, 1.0) == pytest.approx(0.5)
        assert warmup_cosine_lr(99, 10, 100, 10, 1.0) == pytest.approx(0.99)

    def test_cosine_phase(self):
        steps_per_epoch, n_epoch, warm, max_lr = 10, 100, 10, 2.0
        for step in [100, 250, 500, 999]:
            s = step - 100
            S = 1000 - 100
            q = 0.5 * (1 + math.cos(math.pi * s / S))
            expect = max_lr * q + (max_lr * 0.001) * (1 - q)
            assert warmup_cosine_lr(step, steps_per_epoch, n_epoch, warm,
                                    max_lr) == pytest.approx(expect)

    def test_floor_is_point1_percent(self):
        lr = warmup_cosine_lr(1000, 10, 100, 10, 1.0)
        assert lr == pytest.approx(0.001)


class TestAUC:
    def test_matches_sklearn(self, np_rng):
        for _ in range(10):
            y = np_rng.integers(0, 2, 50)
            if y.min() == y.max():
                continue
            s = np_rng.random(50)
            assert _auc(y, s) == pytest.approx(roc_auc_score(y, s))

    def test_matches_sklearn_with_ties(self, np_rng):
        y = np_rng.integers(0, 2, 100)
        s = np_rng.integers(0, 5, 100).astype(float)  # heavy ties
        assert _auc(y, s) == pytest.approx(roc_auc_score(y, s))


def _tasks():
    return [TaskConfig(0, "cls", "softmax", "accuracy"),
            TaskConfig(1, "ml", "sigmoid", "multilabel_accuracy"),
            TaskConfig(2, "auc_t", "sigmoid", "auc")]


class TestLogger:
    def test_epoch_metrics(self, np_rng):
        tasks = _tasks()
        log = MetricsLogger(tasks)
        all_cls_true, all_cls_pred = [], []
        for _ in range(4):
            B, C = 8, 5
            cls_pred = np_rng.random((B, C))
            cls_true = np_rng.integers(0, C, B)
            ml_pred = np_rng.random((B, C))
            ml_true = (np_rng.random((B, C)) > 0.5).astype(float)
            auc_pred = np_rng.random((B, 1))
            auc_true = np_rng.integers(0, 2, B)
            log.update({"cls": 1.0, "ml": 2.0, "auc_t": 3.0},
                       {"cls": cls_pred, "ml": ml_pred, "auc_t": auc_pred},
                       {"cls": cls_true, "ml": ml_true, "auc_t": auc_true})
            all_cls_true.extend(cls_true)
            all_cls_pred.extend(np.argmax(cls_pred, -1))
        log.compute_metric()
        assert log.metrics["cls"][0] == pytest.approx(
            accuracy_score(all_cls_true, all_cls_pred))
        assert log.losses_epoch["cls"][0] == pytest.approx(1.0)
        assert 0.0 <= log.metrics["ml"][0] <= 1.0
        assert 0.0 <= log.metrics["auc_t"][0] <= 1.0

    def test_multilabel_exact_match(self):
        t = [TaskConfig(0, "ml", "sigmoid", "multilabel_accuracy")]
        log = MetricsLogger(t)
        pred = np.array([[0.9, 0.1], [0.6, 0.6], [0.4, 0.9]])
        true = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        log.update({"ml": 0.0}, {"ml": pred}, {"ml": true})
        log.compute_metric()
        # rows 0 and 2 exact-match at threshold 0.5; row 1 fails on col 1
        assert log.metrics["ml"][0] == pytest.approx(2 / 3)

    def test_weights_mask_padded_instances(self, np_rng):
        t = [TaskConfig(0, "cls", "softmax", "accuracy")]
        log = MetricsLogger(t)
        pred = np.eye(4)[[0, 1, 2, 3]].astype(float)
        true = np.array([0, 1, 0, 0])  # rows 2,3 wrong but padded
        log.update({"cls": 0.0}, {"cls": pred}, {"cls": true},
                   weights=np.array([1, 1, 0, 0]))
        log.compute_metric()
        assert log.metrics["cls"][0] == pytest.approx(1.0)

    def test_print_stats_runs(self, capsys):
        t = [TaskConfig(0, "cls", "softmax", "accuracy")]
        log = MetricsLogger(t)
        log.update({"cls": 0.5}, {"cls": np.eye(2)}, {"cls": np.array([0, 1])})
        log.compute_metric()
        log.print_stats(0, train=True, lr=0.01)
        out = capsys.readouterr().out
        assert "accuracy: 1.00000" in out and "lr: 0.01" in out


def test_write_jsonl(tmp_path):
    import json
    t = [TaskConfig(0, "cls", "softmax", "accuracy")]
    log = MetricsLogger(t)
    log.update({"cls": 0.5}, {"cls": np.eye(2)}, {"cls": np.array([0, 1])})
    log.compute_metric()
    p = str(tmp_path / "m.jsonl")
    log.write_jsonl(p, 0, "train", lr=0.01)
    log.update({"cls": 0.4}, {"cls": np.eye(2)}, {"cls": np.array([0, 1])})
    log.compute_metric()
    log.write_jsonl(p, 1, "train", lr=0.02)
    rows = [json.loads(l) for l in open(p)]
    assert rows[0] == {"epoch": 0, "split": "train", "cls_loss": 0.5,
                       "cls_accuracy": 1.0, "lr": 0.01}
    assert rows[1]["epoch"] == 1 and rows[1]["cls_loss"] == 0.4
