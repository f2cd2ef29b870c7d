"""On-device sparse densification path (conf.sparse_input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.config import config_from_dict
from ips_tpu.data.mnist import MegapixelMNIST, generate_megapixel_mnist
from ips_tpu.native import densify_patchify
from ips_tpu.ops.densify import densify_patches

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



class TestDensifyOp:
    def test_matches_host_op(self, np_rng):
        H, W, C, ph = 60, 40, 1, 20
        nnz = 150
        idx = np.sort(np_rng.choice(H * W, nnz, replace=False)).astype(
            np.int32)
        vals = np_rng.random(nnz).astype(np.float32)
        expect = densify_patchify(idx.astype(np.int64), vals, (H, W, C),
                                  (ph, ph), (ph, ph))
        got = densify_patches(jnp.asarray(idx)[None],
                              jnp.asarray(vals)[None], (H, W), (ph, ph))
        np.testing.assert_allclose(np.asarray(got)[0], expect, rtol=1e-6)

    def test_padded_entries_harmless(self):
        # padded (idx=0, val=0) entries must not clobber a real value at 0
        idx = jnp.asarray([[0, 5, 0, 0]], jnp.int32)
        vals = jnp.asarray([[0.7, 0.3, 0.0, 0.0]], jnp.float32)
        out = np.asarray(densify_patches(idx, vals, (4, 4), (2, 2)))
        assert out[0, 0, 0, 0, 0] == pytest.approx(0.7)
        assert out[0, 0 if 5 // 4 < 2 else 1].sum() >= 0  # shape sanity
        assert out.sum() == pytest.approx(1.0)

    def test_requires_exact_tiling(self):
        with pytest.raises(ValueError, match="exact tiling"):
            densify_patches(jnp.zeros((1, 4), jnp.int32),
                            jnp.zeros((1, 4)), (10, 10), (3, 3))


@pytest.fixture(scope="module")
def sparse_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mnist_sparse"))
    generate_megapixel_mnist(d, n_train=10, n_test=4, width=200, height=200,
                             n_noise=4, digit_source="sklearn")
    return d


def _conf(d, **kw):
    base = dict(
        n_epoch=1, B=4, B_seq=4, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, data_dir=d, is_image=True, enc_type="resnet18",
        n_chan_in=1, n_res_blocks=2, shuffle=True, n_token=4, N=16, M=4,
        I=4, patch_size=[50, 50], patch_stride=[50, 50], use_pos=True,
        H=4, D=128, D_k=16, D_v=16, D_inner=128, compute_dtype="float32",
        donate_buffers=False, sparse_input=True,
        tasks={"task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task1": {"id": 1, "name": "max", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task2": {"id": 2, "name": "top", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task3": {"id": 3, "name": "multi", "act_fn": "sigmoid",
                         "metric": "multilabel_accuracy"}})
    base.update(kw)
    return config_from_dict(base)


class TestSparseDataset:
    def test_emits_padded_pairs(self, sparse_dir):
        conf = _conf(sparse_dir)
        ds = MegapixelMNIST(conf, train=True)
        item = ds[0]
        assert "input" not in item
        assert item["input_idx"].shape == item["input_val"].shape
        assert item["input_idx"].shape[0] % 512 == 0
        assert (item["img_hw"] == [200, 200]).all()

    def test_sparse_equals_dense_patches(self, sparse_dir):
        conf_s = _conf(sparse_dir)
        conf_d = _conf(sparse_dir, sparse_input=False)
        ds_s = MegapixelMNIST(conf_s, train=True)
        ds_d = MegapixelMNIST(conf_d, train=True)
        from ips_tpu.train.steps import IPSTrainer
        tr = IPSTrainer(conf_s)
        item = ds_s[3]
        dense = tr.densify(item["input_idx"][None], item["input_val"][None],
                           (200, 200))
        np.testing.assert_allclose(np.asarray(dense)[0], ds_d[3]["input"],
                                   rtol=1e-6)

    def test_rejects_overlapping_patches(self, sparse_dir):
        conf = _conf(sparse_dir, patch_stride=[25, 25], N=49)
        with pytest.raises(ValueError, match="exact patch tiling"):
            MegapixelMNIST(conf, train=True)


def test_sparse_steps_per_dispatch_matches_single(sparse_dir):
    """K sparse fused steps per dispatch == K single dispatches (10
    samples -> 3 loader batches: one K=2 group + a tail single)."""
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer

    def run(K):
        conf = _conf(sparse_dir, steps_per_dispatch=K)
        train = MegapixelMNIST(conf, train=True)
        loader = DataLoader(train, batch_size=conf.B_seq, shuffle=False)
        trainer = IPSTrainer(conf)
        log = MetricsLogger(conf.task_list)
        lr = train_one_epoch(trainer, loader, 0, log, conf)
        return trainer, log, lr

    t1, l1, lr1 = run(1)
    tK, lK, lrK = run(2)
    assert lr1 == lrK
    assert len(lK.y_trues["majority"]) == 10
    l1.compute_metric()
    lK.compute_metric()
    np.testing.assert_allclose(
        np.asarray(l1.losses_epoch["majority"], np.float64),
        np.asarray(lK.losses_epoch["majority"], np.float64), rtol=1e-5)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(tK.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_full_loop_sparse(sparse_dir):
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import evaluate, train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer
    conf = _conf(sparse_dir)
    train = MegapixelMNIST(conf, train=True)
    loader = DataLoader(train, batch_size=conf.B_seq, shuffle=False)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    # 10 samples -> 2 full batches + padded tail; all logged once
    assert len(log.y_trues["majority"]) == 10
    log.compute_metric()
    assert np.isfinite(log.losses_epoch["majority"][0])
    evaluate(trainer, loader, log, conf)
    log.compute_metric()


@pytest.mark.parametrize("K", [1, 2])
def test_sparse_eval_grouped_matches_split(sparse_dir, K):
    """The round-3 fused sparse eval (densify+select+eval in one dispatch,
    K per dispatch) must match the old split schedule (densify dispatch +
    fused dense eval) exactly: same losses, same metrics."""
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import (_batch_mask, _pad_loader_batch,
                                    _to_host, evaluate)
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer

    conf = _conf(sparse_dir, steps_per_dispatch=K)
    trainer = IPSTrainer(conf)
    test = MegapixelMNIST(conf, train=False)

    # old split schedule, spelled out
    log_old = MetricsLogger(conf.task_list)
    base_rng = jax.random.PRNGKey(conf.seed * 7_000_003 + 1)
    loader = DataLoader(test, batch_size=conf.B_seq, shuffle=False)
    for it, batch in enumerate(loader):
        rng = jax.random.fold_in(base_rng, it)
        batch, row_weights = _pad_loader_batch(conf, batch)
        hw = tuple(int(v) for v in np.asarray(batch["img_hw"])[0])
        patches = trainer.densify(batch["input_idx"], batch["input_val"],
                                  hw)
        labels = {t.name: np.asarray(batch[t.name]) for t in conf.task_list}
        mask = _batch_mask(batch, conf.B, patches.shape[1])
        loss, tls, prs = trainer.fused_eval_step(
            patches, jnp.asarray(mask),
            jax.device_put({k: jnp.asarray(v) for k, v in labels.items()}),
            jnp.asarray(row_weights), rng)
        tl, pr = _to_host(tls, prs)
        log_old.update(tl, pr, labels, weights=row_weights)
    log_old.compute_metric()

    log_new = MetricsLogger(conf.task_list)
    evaluate(trainer, DataLoader(test, batch_size=conf.B_seq,
                                 shuffle=False), log_new, conf)
    log_new.compute_metric()
    for t in conf.task_list:
        np.testing.assert_allclose(
            np.asarray(log_old.losses_epoch[t.name], np.float64),
            np.asarray(log_new.losses_epoch[t.name], np.float64), rtol=1e-5)
        np.testing.assert_allclose(log_old.metrics[t.name],
                                   log_new.metrics[t.name], rtol=1e-6)
