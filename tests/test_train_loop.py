"""End-to-end training: overfit a tiny synthetic patch dataset.

Mirrors the reference's implicit QA (metric-based validation, SURVEY.md §4)
as an explicit integration test: the full Dataset -> DataLoader -> IPS ->
assembly -> AdamW pipeline must fit a learnable toy problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.data.loader import DataLoader, Dataset
from ips_tpu.train.loop import BatchAssembler, evaluate, train_one_epoch
from ips_tpu.train.metrics import MetricsLogger
from ips_tpu.train.steps import IPSTrainer

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



class SignalPatches(Dataset):
    """Each sample: N noise patches, one carries a class-dependent pattern."""

    def __init__(self, conf, n_samples=16, seed=0):
        self.conf = conf
        rng = np.random.default_rng(seed)
        ph, pw = conf.patch_size
        self.samples = []
        for i in range(n_samples):
            cls = i % conf.n_class if conf.n_class > 1 else i % 2
            patches = rng.normal(0, 0.1,
                                 (conf.N, ph, pw, conf.n_chan_in)
                                 ).astype(np.float32)
            slot = rng.integers(0, conf.N)
            # class-dependent deterministic pattern, high amplitude
            patt = np.zeros((ph, pw, conf.n_chan_in), np.float32)
            patt[cls::4, :, :] = 2.0
            patches[slot] = patt
            self.samples.append({
                "input": patches,
                "majority": np.int64(cls),
                "multi": np.eye(conf.n_class, dtype=np.float32)[cls]})

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def overfit_conf(tmp_path_factory):
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=8, B=4, B_seq=4, n_epoch_warmup=1, lr=3e-4, wd=0.01,
        n_class=4, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=2,
        N=12, M=4, I=4, patch_size=[16, 16], patch_stride=[16, 16],
        use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=256,
        compute_dtype="float32", donate_buffers=False, seed=0,
        tasks={
            "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task1": {"id": 1, "name": "multi", "act_fn": "sigmoid",
                      "metric": "multilabel_accuracy"},
        }))


def _run_epochs(conf, n_epoch):
    data = SignalPatches(conf, n_samples=16)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True,
                        seed=conf.seed)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    for epoch in range(n_epoch):
        train_one_epoch(trainer, loader, epoch, log, conf)
        log.compute_metric()
    return trainer, log, loader


def test_overfit_fused_path(overfit_conf):
    """B_seq == B exercises the fused select+train jit."""
    trainer, log, loader = _run_epochs(overfit_conf, overfit_conf.n_epoch)
    losses = log.losses_epoch["majority"]
    assert losses[-1] < losses[0] * 0.7, losses
    # evaluation pipeline end-to-end
    elog = MetricsLogger(overfit_conf.task_list)
    evaluate(trainer, loader, elog, overfit_conf)
    elog.compute_metric()
    assert elog.metrics["majority"][0] >= 0.5   # chance is 0.25


def test_assembly_path_partial_batch(overfit_conf):
    """B_seq < B exercises assembly + zero-padded final partial batch."""
    conf = overfit_conf.replace(B_seq=2, n_epoch=2)
    # 14 samples -> 7 loader batches of 2 -> 3 full optimizer batches of 4
    # plus a final partial batch of 2 that must be padded+masked.
    data = SignalPatches(conf, n_samples=14)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    # all 14 instances logged exactly once — padded rows must NOT leak in
    assert len(log.y_trues["majority"]) == 14
    assert len(log.losses_it["majority"]) == 4  # 3 full + 1 partial step
    log.compute_metric()
    assert np.isfinite(log.losses_epoch["majority"][0])


class TestBatchAssembler:
    def test_pad_and_weights(self, overfit_conf):
        conf = overfit_conf.replace(B=4)
        a = BatchAssembler(conf)
        mem = jnp.ones((3, conf.M, 16, 16, 1))
        mask = jnp.ones((3, conf.M), bool)
        labels = {"majority": jnp.array([1, 2, 3], jnp.int32),
                  "multi": jnp.ones((3, 4), jnp.float32)}
        a.add(mem, None, mask, labels)
        assert not a.full
        patch, pos, mmask, lab, w = a.take()
        assert patch.shape == (4, conf.M, 16, 16, 1)
        assert pos is None
        np.testing.assert_array_equal(np.asarray(w), [1, 1, 1, 0])
        np.testing.assert_array_equal(np.asarray(lab["majority"]),
                                      [1, 2, 3, 0])
        assert a.n_prep == 0  # reset after take

    def test_accumulates_to_full(self, overfit_conf):
        conf = overfit_conf.replace(B=4)
        a = BatchAssembler(conf)
        for _ in range(2):
            a.add(jnp.ones((2, conf.M, 16, 16, 1)), None,
                  jnp.ones((2, conf.M), bool),
                  {"majority": jnp.zeros(2, jnp.int32),
                   "multi": jnp.zeros((2, 4), jnp.float32)})
        assert a.full
        patch, _, _, _, w = a.take()
        assert patch.shape[0] == 4 and np.asarray(w).sum() == 4


def test_partial_last_loader_batch_padded_fused(overfit_conf):
    """10 samples, B=B_seq=4: last loader batch (2) is padded up to 4 so
    the fused step keeps ONE compiled shape; padded rows never reach the
    logger."""
    conf = overfit_conf.replace(n_epoch=1)
    data = SignalPatches(conf, n_samples=10)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    assert len(log.y_trues["majority"]) == 10
    assert len(log.losses_it["majority"]) == 3
    # one fused compilation only, despite the ragged tail
    assert trainer._fused._cache_size() == 1
    assert trainer._select._cache_size() == 0   # fused path never split


def test_mask_padding_attention(overfit_conf):
    """mask_padding=True must exclude invalid memory slots from the final
    aggregation attention (reference zero-fills without masking)."""
    conf_m = overfit_conf.replace(mask_padding=True, n_epoch=1)
    conf_u = overfit_conf.replace(mask_padding=False, n_epoch=1)
    rng = jax.random.PRNGKey(0)
    mem = jax.random.uniform(rng, (4, conf_m.M, 16, 16, 1))
    mem_mask = jnp.ones((4, conf_m.M), bool).at[:, -2:].set(False)
    labels = {"majority": jnp.zeros(4, jnp.int32),
              "multi": jnp.zeros((4, 4), jnp.float32)}
    w = jnp.ones(4)

    tm = IPSTrainer(conf_m, rng=jax.random.PRNGKey(1))
    tu = IPSTrainer(conf_u, rng=jax.random.PRNGKey(1))
    _, _, pm = tm.eval_step(mem, None, mem_mask, labels, w)
    _, _, pu = tu.eval_step(mem, None, mem_mask, labels, w)
    # same params, same inputs: only the attention mask differs
    assert not np.allclose(np.asarray(pm["majority"]),
                           np.asarray(pu["majority"]))
    # with an all-true mask both configs agree
    full = jnp.ones((4, conf_m.M), bool)
    _, _, pm2 = tm.eval_step(mem, None, full, labels, w)
    _, _, pu2 = tu.eval_step(mem, None, full, labels, w)
    np.testing.assert_allclose(np.asarray(pm2["majority"]),
                               np.asarray(pu2["majority"]), rtol=1e-5)


@pytest.mark.parametrize("K", [2, 3])
def test_steps_per_dispatch_matches_single(overfit_conf, K):
    """K fused steps per dispatch must produce the SAME update sequence as
    K single dispatches: same per-step losses, same final params. K=3 over
    4 batches/epoch also exercises the smaller-than-K tail fallback."""
    conf_1 = overfit_conf.replace(n_epoch=2)
    conf_K = conf_1.replace(steps_per_dispatch=K)
    t1, log1, _ = _run_epochs(conf_1, 2)
    tK, logK, _ = _run_epochs(conf_K, 2)
    for task in ("majority", "multi"):
        # per-step losses drift only by XLA fusion rounding (scan-compiled
        # body vs standalone jit; step 1 is bit-identical, later ~1e-7)
        np.testing.assert_allclose(
            np.asarray(log1.losses_epoch[task], np.float64),
            np.asarray(logK.losses_epoch[task], np.float64), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(tK.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("K", [2, 3])
def test_eval_steps_per_dispatch_matches_single(overfit_conf, K):
    """K eval batches per dispatch == per-batch eval (16 samples -> 4
    batches: K=3 exercises the short-tail fallback)."""
    conf1 = overfit_conf.replace(n_epoch=1)
    confK = conf1.replace(steps_per_dispatch=K)
    trainer, _, _ = _run_epochs(conf1, 1)
    data = SignalPatches(conf1, n_samples=16)
    eval_loader = DataLoader(data, batch_size=conf1.B_seq, shuffle=False)
    l1 = MetricsLogger(conf1.task_list)
    lK = MetricsLogger(confK.task_list)
    evaluate(trainer, eval_loader, l1, conf1)
    evaluate(trainer, eval_loader, lK, confK)
    l1.compute_metric()
    lK.compute_metric()
    for task in ("majority", "multi"):
        np.testing.assert_allclose(
            np.asarray(l1.losses_epoch[task], np.float64),
            np.asarray(lK.losses_epoch[task], np.float64), rtol=1e-6)
        np.testing.assert_allclose(l1.metrics[task], lK.metrics[task],
                                   rtol=1e-6)


def test_prefetch_pipeline_matches_serial(overfit_conf):
    """prefetch_depth=2 overlaps batch k+1's device_put with batch k's
    step; it must be bit-identical to the serial path (same fold_in rng
    per iteration index, same jitted functions)."""
    conf_serial = overfit_conf.replace(prefetch_depth=1, n_epoch=2)
    conf_pipe = overfit_conf.replace(prefetch_depth=2, n_epoch=2)
    _, log_s, loader_s = _run_epochs(conf_serial, 2)
    trainer_p, log_p, loader_p = _run_epochs(conf_pipe, 2)
    for task in ("majority", "multi"):
        np.testing.assert_array_equal(
            np.asarray(log_s.losses_epoch[task]),
            np.asarray(log_p.losses_epoch[task]))
    # eval side of the pipeline (fresh UNSHUFFLED loader: the training
    # loader reshuffles statefully per iteration, so two successive
    # evaluate() calls over it would see different batch orders)
    data = SignalPatches(conf_pipe, n_samples=16)
    eval_loader = DataLoader(data, batch_size=conf_pipe.B_seq,
                             shuffle=False)
    elog_s, elog_p = (MetricsLogger(conf_serial.task_list),
                      MetricsLogger(conf_pipe.task_list))
    evaluate(trainer_p, eval_loader, elog_s, conf_serial)
    evaluate(trainer_p, eval_loader, elog_p, conf_pipe)
    elog_s.compute_metric()
    elog_p.compute_metric()
    for task in ("majority", "multi"):
        np.testing.assert_array_equal(
            np.asarray(elog_s.losses_epoch[task]),
            np.asarray(elog_p.losses_epoch[task]))
        assert elog_s.metrics[task] == elog_p.metrics[task]


def _legacy_assembler_epochs(conf, n_epoch, n_samples=16):
    """Reference-shaped schedule, spelled out: per-loader-batch select
    dispatch + BatchAssembler + train_step per optimizer batch, with the
    exact rng/lr derivation the pre-fused loop used. The fused assembled
    path (loop._train_epoch_assembled) must reproduce this update
    sequence."""
    from ips_tpu.train.schedule import warmup_cosine_lr

    data = SignalPatches(conf, n_samples=n_samples)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True,
                        seed=conf.seed)
    trainer = IPSTrainer(conf)
    steps_per_epoch = len(loader)
    losses = []
    for epoch in range(n_epoch):
        base_rng = jax.random.PRNGKey(conf.seed * 1_000_003 + epoch)
        assembler = BatchAssembler(conf)
        for it, batch in enumerate(loader):
            rng = jax.random.fold_in(base_rng, it)
            patches = jnp.asarray(batch["input"])
            mask = jnp.ones(patches.shape[:2], bool)
            mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask,
                                                             rng)
            labels = {"majority": np.asarray(batch["majority"], np.int32),
                      "multi": np.asarray(batch["multi"], np.float32)}
            assembler.add(mem_patch, mem_pos, mem_mask, labels)
            if assembler.full or it == steps_per_epoch - 1:
                patch, pos, mmask, lab, weights = assembler.take()
                lr = warmup_cosine_lr(epoch * steps_per_epoch + it + 1,
                                      steps_per_epoch, conf.n_epoch,
                                      conf.n_epoch_warmup, conf.lr)
                loss, _, _ = trainer.train_step(
                    patch, pos, mmask, lab, weights,
                    jax.random.fold_in(rng, 1), lr)
                losses.append(float(loss))
    return trainer, losses


def test_assembled_fused_matches_legacy_schedule(overfit_conf):
    """The fused assembled path (r loader batches -> ONE dispatch, K=2
    steps per dispatch — the route is gated on steps_per_dispatch > 1)
    must produce the legacy select-assemble-train update sequence exactly:
    same per-step losses, same final params (VERDICT r2 item 3)."""
    conf = overfit_conf.replace(B_seq=2, n_epoch=2)
    t_legacy, legacy_losses = _legacy_assembler_epochs(conf, 2)

    conf_k = conf.replace(steps_per_dispatch=2)
    data = SignalPatches(conf_k, n_samples=16)
    loader = DataLoader(data, batch_size=conf_k.B_seq, shuffle=True,
                        seed=conf_k.seed)
    t_new = IPSTrainer(conf_k)
    log = MetricsLogger(conf_k.task_list)
    for epoch in range(2):
        train_one_epoch(t_new, loader, epoch, log, conf_k)
        log.compute_metric()

    new_losses = [float(np.mean(v)) for v in
                  zip(*(log.losses_epoch[t] for t in ("majority", "multi")))]
    legacy_means = np.asarray(legacy_losses, np.float64).reshape(2, -1)
    np.testing.assert_allclose(np.mean(legacy_means, axis=1),
                               np.asarray(new_losses, np.float64), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t_legacy.state.params),
                    jax.tree_util.tree_leaves(t_new.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("K", [2, 3])
def test_assembled_steps_per_dispatch_matches_single(overfit_conf, K):
    """K assembled optimizer steps per dispatch == one per dispatch:
    same per-step losses, same final params. With 16 samples, B_seq=2,
    B=4 -> 4 optimizer steps/epoch; K=3 exercises the short-tail
    fallback (VERDICT r2 item 3, reference camelyon shape B_seq<B)."""
    conf1 = overfit_conf.replace(B_seq=2, n_epoch=2)
    confK = conf1.replace(steps_per_dispatch=K)

    def run(conf):
        data = SignalPatches(conf, n_samples=16)
        loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True,
                            seed=conf.seed)
        trainer = IPSTrainer(conf)
        log = MetricsLogger(conf.task_list)
        for epoch in range(2):
            train_one_epoch(trainer, loader, epoch, log, conf)
            log.compute_metric()
        return trainer, log

    t1, log1 = run(conf1)
    tK, logK = run(confK)
    for task in ("majority", "multi"):
        np.testing.assert_allclose(
            np.asarray(log1.losses_epoch[task], np.float64),
            np.asarray(logK.losses_epoch[task], np.float64), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(tK.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("K", [1, 2])
def test_assembled_eval_matches_legacy(overfit_conf, K):
    """Fused assembled eval (r loader batches -> one dispatch, K per
    dispatch) must reproduce the legacy per-batch select + assembled
    eval exactly: same losses, same metrics. 14 samples with B_seq=2,
    B=4 -> 3 full eval groups + a partial legacy tail."""
    conf = overfit_conf.replace(B_seq=2, n_epoch=1)
    confK = conf.replace(steps_per_dispatch=K)
    trainer = IPSTrainer(conf)
    data = SignalPatches(conf, n_samples=14)

    # legacy schedule, spelled out (per-batch select + assembler + eval)
    base_rng = jax.random.PRNGKey(conf.seed * 7_000_003 + 1)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    log_legacy = MetricsLogger(conf.task_list)
    assembler = BatchAssembler(conf)
    n = len(loader)
    for it, batch in enumerate(loader):
        rng = jax.random.fold_in(base_rng, it)
        patches = jnp.asarray(batch["input"])
        mask = jnp.ones(patches.shape[:2], bool)
        mem = trainer.select(patches, mask, rng)
        labels = {"majority": np.asarray(batch["majority"], np.int32),
                  "multi": np.asarray(batch["multi"], np.float32)}
        assembler.add(mem[0], mem[1], mem[3], labels)
        if assembler.full or it == n - 1:
            patch, pos, mmask, lab, weights = assembler.take()
            loss, tls, prs = trainer.eval_step(patch, pos, mmask, lab,
                                               weights)
            tl = {k: float(v) for k, v in tls.items()}
            pr = {k: np.asarray(v) for k, v in prs.items()}
            log_legacy.update(tl, pr,
                              {k: np.asarray(v) for k, v in lab.items()},
                              weights=np.asarray(weights))
    log_legacy.compute_metric()

    log_new = MetricsLogger(confK.task_list)
    evaluate(trainer, DataLoader(data, batch_size=conf.B_seq,
                                 shuffle=False), log_new, confK)
    log_new.compute_metric()

    for task in ("majority", "multi"):
        np.testing.assert_allclose(
            np.asarray(log_legacy.losses_epoch[task], np.float64),
            np.asarray(log_new.losses_epoch[task], np.float64), rtol=1e-5)
        np.testing.assert_allclose(log_legacy.metrics[task],
                                   log_new.metrics[task], rtol=1e-6)
    assert len(log_new.y_trues["majority"]) == 0  # reset by compute_metric
