"""Gradient-side memory knobs: remat_encode and grad_encode_chunk.

remat_encode must be EXACT (bit-level intent; asserted to fp32 rounding):
jax.checkpoint recomputes the same ops on the same inputs. grad_encode_chunk
changes train-BatchNorm batching to per-chunk "ghost" statistics — its
correctness claim is scan+remat == an explicit per-chunk python loop, which
these tests assert against an independently written oracle.

The reference re-encodes all M selected patches in one conv forward
(reference architecture/ips_net.py:264-283); these knobs bound that
forward's activation memory for large-M image mode.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.config import config_from_dict
from ips_tpu.models.ips_net import IPSModel
from ips_tpu.train.steps import IPSTrainer, compute_task_losses

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



def _conf(**over):
    base = dict(
        n_epoch=2, B=3, B_seq=3, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=4, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=2,
        N=12, M=6, I=6, patch_size=[16, 16], patch_stride=[16, 16],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=256,
        compute_dtype="float32", donate_buffers=False, seed=0,
        attn_dropout=0.1, dropout=0.1,
        tasks={
            "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task1": {"id": 1, "name": "multi", "act_fn": "sigmoid",
                      "metric": "multilabel_accuracy"},
        })
    base.update(over)
    return config_from_dict(base)


def _inputs(conf, seed=0):
    rng = np.random.default_rng(seed)
    B, M = conf.B, conf.M
    ph, pw = conf.patch_size
    mem_patch = jnp.asarray(
        rng.normal(0, 1, (B, M, ph, pw, conf.n_chan_in)).astype(np.float32))
    mem_pos = (jnp.asarray(rng.normal(0, 1, (B, M, conf.D))
                           .astype(np.float32)) if conf.use_pos else None)
    mem_mask = jnp.ones((B, M), bool)
    labels = {
        "majority": jnp.asarray(rng.integers(0, conf.n_class, (B,))),
        "multi": jnp.asarray(
            rng.integers(0, 2, (B, conf.n_class)).astype(np.float32)),
    }
    weights = jnp.ones((B,), jnp.float32)
    return mem_patch, mem_pos, mem_mask, labels, weights


def _loss_and_grads(conf, seed=0):
    """loss + grads + updated batch_stats through the trainer's loss fn."""
    trainer = IPSTrainer(conf)
    mem_patch, mem_pos, mem_mask, labels, weights = _inputs(conf, seed)
    drop = jax.random.PRNGKey(7)

    def f(params):
        loss, (task_losses, preds, new_bs) = trainer._loss_and_aux(
            params, trainer.state.batch_stats, mem_patch, mem_pos, mem_mask,
            labels, weights, drop)
        return loss, new_bs

    (loss, new_bs), grads = jax.jit(
        jax.value_and_grad(f, has_aux=True))(trainer.state.params)
    return loss, grads, new_bs, trainer


def _tree_allclose(a, b, rtol, atol):
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_remat_encode_exact():
    """remat only changes WHEN activations exist, never any value."""
    loss0, grads0, bs0, _ = _loss_and_grads(_conf())
    loss1, grads1, bs1, _ = _loss_and_grads(_conf(remat_encode=True))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    _tree_allclose(grads0, grads1, rtol=1e-5, atol=1e-6)
    _tree_allclose(bs0, bs1, rtol=1e-6, atol=1e-8)


def test_chunk_ge_M_equals_remat():
    loss0, grads0, bs0, _ = _loss_and_grads(_conf(remat_encode=True))
    loss1, grads1, bs1, _ = _loss_and_grads(
        _conf(grad_encode_chunk=64))  # >= M: whole-batch remat
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    _tree_allclose(grads0, grads1, rtol=1e-5, atol=1e-6)
    _tree_allclose(bs0, bs1, rtol=1e-6, atol=1e-8)


def _ghost_oracle(conf, trainer, chunk, inputs):
    """Independent per-chunk python-loop ghost-BN forward + grads."""
    mem_patch, mem_pos, mem_mask, labels, weights = inputs
    model = trainer.model
    drop = jax.random.PRNGKey(7)
    attn_mask = mem_mask if conf.mask_padding else None
    M = mem_patch.shape[1]

    def f(params):
        bs = trainer.state.batch_stats
        embs = []
        for start in range(0, M, chunk):
            x = mem_patch[:, start:start + chunk]
            e, mut = model.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                weights=weights, method=IPSModel.encode,
                mutable=["batch_stats"])
            bs = mut["batch_stats"]
            embs.append(e)
        emb = jnp.concatenate(embs, axis=1)
        if mem_pos is not None:
            emb = emb + mem_pos
        variables = {"params": params, "batch_stats": bs}
        image_emb = model.apply(variables, emb, attn_mask, True,
                                method=IPSModel.aggregate,
                                rngs={"dropout": drop})
        preds = model.apply(variables, image_emb, method=IPSModel.predict)
        loss, _ = compute_task_losses(conf, preds, labels, weights)
        return loss, bs

    (loss, bs), grads = jax.jit(
        jax.value_and_grad(f, has_aux=True))(trainer.state.params)
    return loss, grads, bs


@pytest.mark.parametrize("chunk", [2, 3, 4])  # M=6: even, odd-even, tail=2
def test_chunked_matches_loop_oracle(chunk):
    conf = _conf(grad_encode_chunk=chunk)
    loss, grads, bs, trainer = _loss_and_grads(conf)
    oloss, ograds, obs = _ghost_oracle(conf, trainer, chunk, _inputs(conf))
    np.testing.assert_allclose(float(loss), float(oloss), rtol=1e-6)
    _tree_allclose(grads, ograds, rtol=1e-5, atol=1e-6)
    _tree_allclose(bs, obs, rtol=1e-6, atol=1e-8)


def test_chunked_feature_mode():
    conf = config_from_dict(dict(
        n_epoch=2, B=4, B_seq=4, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=1, is_image=False, n_chan_in=32, shuffle=True,
        shuffle_style="batch", n_token=1, N=0, M=6, I=6, use_pos=False,
        H=2, D=16, D_k=8, D_v=8, D_inner=32, compute_dtype="float32",
        donate_buffers=False, grad_encode_chunk=4,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))
    trainer = IPSTrainer(conf)
    rng = np.random.default_rng(0)
    mem_patch = jnp.asarray(
        rng.normal(0, 1, (conf.B, conf.M, conf.n_chan_in))
        .astype(np.float32))
    labels = {"metastases": jnp.asarray(
        rng.integers(0, 2, (conf.B, 1)).astype(np.float32))}
    weights = jnp.ones((conf.B,), jnp.float32)
    drop = jax.random.PRNGKey(7)

    def f(params):
        loss, (_, _, new_bs) = trainer._loss_and_aux(
            params, trainer.state.batch_stats, mem_patch, None,
            jnp.ones((conf.B, conf.M), bool), labels, weights, drop)
        return loss, new_bs

    (loss, bs), grads = jax.jit(
        jax.value_and_grad(f, has_aux=True))(trainer.state.params)
    oloss, ograds, obs = _ghost_oracle(
        conf, trainer, 4,
        (mem_patch, None, jnp.ones((conf.B, conf.M), bool), labels, weights))
    np.testing.assert_allclose(float(loss), float(oloss), rtol=1e-6)
    _tree_allclose(grads, ograds, rtol=1e-5, atol=1e-6)


def test_chunked_under_steps_per_dispatch():
    """grad_encode_chunk composes with K-step dispatch grouping: the
    grouped driver must produce the same update sequence as K single
    dispatches with chunking on (grouping is exact; ghost-BN chunking
    changes the per-step math identically in both arms)."""
    from tests.test_train_loop import _run_epochs
    conf1 = _conf(grad_encode_chunk=2, M=4, I=4, use_pos=False,
                  B=4, B_seq=4, n_epoch=2, lr=3e-4)
    confK = conf1.replace(steps_per_dispatch=2)
    t1, log1, _ = _run_epochs(conf1, 2)
    tK, logK, _ = _run_epochs(confK, 2)
    for task in ("majority", "multi"):
        np.testing.assert_allclose(
            np.asarray(log1.losses_epoch[task], np.float64),
            np.asarray(logK.losses_epoch[task], np.float64), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(tK.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_chunked_trains_through_the_loop():
    """The fused epoch driver trains (loss decreases) with chunking on."""
    from tests.test_train_loop import SignalPatches
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger

    conf = _conf(grad_encode_chunk=2, M=4, I=4, use_pos=False,
                 attn_dropout=0.0, dropout=0.0, n_epoch=4, lr=3e-4)
    data = SignalPatches(conf, n_samples=12)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True,
                        seed=conf.seed)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    losses = []
    for epoch in range(conf.n_epoch):
        train_one_epoch(trainer, loader, epoch, log, conf)
        log.compute_metric()
        losses.append(np.mean([log.losses_epoch[t.name][-1]
                               for t in conf.task_list]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
