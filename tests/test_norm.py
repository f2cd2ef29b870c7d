"""MaskedBatchNorm: parity with flax BatchNorm + correct weighted stats."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ips_tpu.models.norm import MaskedBatchNorm


def _flax_bn_apply(x, train):
    m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5)
    v = m.init(jax.random.PRNGKey(0), x)
    if train:
        return m.apply(v, x, mutable=["batch_stats"])
    return m.apply(v, x), None


def _masked_apply(x, train, weights=None):
    m = MaskedBatchNorm()
    v = m.init(jax.random.PRNGKey(0), x, use_running_average=True)
    if train:
        return m.apply(v, x, use_running_average=False, weights=weights,
                       mutable=["batch_stats"])
    return m.apply(v, x, use_running_average=True), None


def test_matches_flax_batchnorm_train():
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 5, 5, 8)) * 3 + 1
    ref, ref_mut = _flax_bn_apply(x, train=True)
    got, got_mut = _masked_apply(x, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    # running mean matches flax; running var differs from flax by design:
    # torch stores the Bessel-corrected variance (see test below), flax the
    # biased one
    n = 16 * 5 * 5
    np.testing.assert_allclose(
        np.asarray(got_mut["batch_stats"]["mean"]),
        np.asarray(ref_mut["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_mut["batch_stats"]["var"]),
        1.0 * 0.9 + (np.asarray(ref_mut["batch_stats"]["var"]) - 0.9)
        * (n / (n - 1)), rtol=1e-5, atol=1e-6)


def test_matches_torch_batchnorm_train():
    """Golden: train-mode output AND updated running stats vs torch
    (torch normalizes with biased variance but stores the unbiased one in
    running_var — reference BatchNorm2d semantics)."""
    import torch

    rng = np.random.default_rng(7)
    x = rng.normal(1.5, 2.0, (8, 6, 6, 4)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(4, eps=1e-5, momentum=0.1)
    bn.train()
    with torch.no_grad():
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    got, mut = _masked_apply(jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_all_ones_weights_identical_to_unweighted():
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    a, am = _masked_apply(x, True, None)
    b, bm = _masked_apply(x, True, jnp.ones(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(am["batch_stats"]["mean"]),
                               np.asarray(bm["batch_stats"]["mean"]),
                               rtol=1e-6)


def test_weighted_equals_shrunk_batch():
    """Zero-weighted padded rows == physically removing them (the
    reference's shrink_batch semantics, training/iterative.py:52-63)."""
    real = jax.random.normal(jax.random.PRNGKey(3), (6, 3, 3, 4)) * 2 + 5
    padded = jnp.concatenate([real, jnp.zeros((2, 3, 3, 4))])
    w = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    shrunk_out, shrunk_mut = _masked_apply(real, True, None)
    padded_out, padded_mut = _masked_apply(padded, True, w)

    # real rows normalized identically
    np.testing.assert_allclose(np.asarray(padded_out[:6]),
                               np.asarray(shrunk_out), rtol=1e-5, atol=1e-5)
    # running stats identical (no pollution from the zero rows)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(padded_mut["batch_stats"][k]),
            np.asarray(shrunk_mut["batch_stats"][k]), rtol=1e-5, atol=1e-6)


def test_eval_uses_running_stats():
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 4)) * 5
    out, _ = _masked_apply(x, train=False)
    # init running stats are mean 0 / var 1 -> eval output == input (scale 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-3,
                               atol=1e-4)


def test_train_step_weights_reach_batchnorm(tiny_conf):
    """End-to-end: padded instances must not change the updated running
    stats vs training on the real rows only."""
    from ips_tpu.train.steps import IPSTrainer
    conf = tiny_conf.replace(B=4, B_seq=4, N=8, M=3, I=5, use_pos=False)
    rng = jax.random.PRNGKey(5)
    mem = jax.random.uniform(rng, (4, conf.M, 16, 16, 1))
    mem = mem.at[2:].set(0.0)                       # padded rows zeroed
    mask = jnp.ones((4, conf.M), bool)
    labels = {"majority": jnp.array([1, 2, 0, 0], jnp.int32),
              "multi": jnp.zeros((4, conf.n_class), jnp.float32)}
    w_padded = jnp.array([1, 1, 0, 0], jnp.float32)

    t1 = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
    t1.train_step(mem, None, mask, labels, w_padded, rng, 0.0)

    # reference computation: the physically shrunk batch (first 2 rows) —
    # exactly what the reference's shrink_batch would train on
    t2 = IPSTrainer(conf.replace(B=2, B_seq=2), rng=jax.random.PRNGKey(0))
    labels2 = {k: v[:2] for k, v in labels.items()}
    t2.train_step(mem[:2], None, mask[:2], labels2, jnp.ones(2), rng, 0.0)

    bs1 = jax.tree.map(np.asarray, t1.state.batch_stats)
    bs2 = jax.tree.map(np.asarray, t2.state.batch_stats)
    # weighted stats over {r0, r1, 0, 0} with w=[1,1,0,0] equal plain stats
    # over {r0, r1, r0, r1}
    flat1 = jax.tree_util.tree_leaves(bs1)
    flat2 = jax.tree_util.tree_leaves(bs2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
