"""Fused scorer equivalence: attention path == fast GEMM path == Pallas.

The three implementations must agree to float tolerance; the attention
path is itself golden-tested against numpy in test_transformer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.models.transformer import CrossAttnTransformer
from ips_tpu.ops.score_kernel import fast_scores, fold_query, pallas_scores

B, L, D, H, DK, T = 2, 40, 32, 4, 8, 3


@pytest.fixture(scope="module")
def setup():
    m = CrossAttnTransformer(n_token=T, H=H, D=D, D_k=DK, D_v=DK,
                             D_inner=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    variables = m.init(jax.random.PRNGKey(1), x)
    att = variables["params"]["crs_attn"]
    w_eff = fold_query(att["q"], att["q_w"]["kernel"], att["k_w"]["kernel"],
                       H, DK)
    return m, variables, x, w_eff


def test_fast_matches_attention_path(setup):
    m, variables, x, w_eff = setup
    ref = np.asarray(m.apply(variables, x,
                             method=CrossAttnTransformer.get_scores))
    fast = np.asarray(fast_scores(x, w_eff))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_fast_matches_attention_masked(setup):
    m, variables, x, w_eff = setup
    mask = np.ones((B, L), bool)
    mask[:, -7:] = False
    ref = np.asarray(m.apply(variables, x, jnp.asarray(mask),
                             method=CrossAttnTransformer.get_scores))
    fast = np.asarray(fast_scores(x, w_eff, jnp.asarray(mask)))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)
    assert (fast[:, -7:] < 1e-6).all()


def test_pallas_matches_fast_interpret(setup):
    _, _, x, w_eff = setup
    ref = np.asarray(fast_scores(x, w_eff))
    got = np.asarray(pallas_scores(x, w_eff, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pallas_masked_interpret(setup):
    _, _, x, w_eff = setup
    mask = np.ones((B, L), bool)
    mask[0, -5:] = False
    mask[1, :3] = False
    ref = np.asarray(fast_scores(x, w_eff, jnp.asarray(mask)))
    got = np.asarray(pallas_scores(x, w_eff, jnp.asarray(mask),
                                   interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pallas_large_tiled_interpret():
    # L > TL exercises the double-buffered multi-tile path.
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1024, 128))
    w_eff = jax.random.normal(jax.random.PRNGKey(3), (128, 8)) * 0.1
    ref = np.asarray(fast_scores(x, w_eff))
    got = np.asarray(pallas_scores(x, w_eff, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_pallas_unaligned_L_interpret():
    # L not a multiple of the tile/sublane sizes exercises padding.
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 37, 16))
    w_eff = jax.random.normal(jax.random.PRNGKey(5), (16, 12)) * 0.1
    ref = np.asarray(fast_scores(x, w_eff))
    got = np.asarray(pallas_scores(x, w_eff, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_scores_sum_to_one(setup):
    _, _, x, w_eff = setup
    s = np.asarray(fast_scores(x, w_eff))
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)


def test_pallas_trains_through_the_model():
    """score_impl='pallas' must wire through selection + the fused
    select+train step (ips_net.py scores() dispatch) and produce the same
    update as 'fast' — an integration guard for the kernel's call site,
    not just its standalone numerics."""
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    base = dict(
        n_epoch=1, B=4, B_seq=4, n_epoch_warmup=1, lr=1e-3, wd=0.01,
        n_class=1, is_image=False, n_chan_in=24, shuffle=False,
        n_token=1, N=16, M=4, I=4, use_pos=False, H=2, D=16, D_k=8,
        D_v=8, D_inner=32, compute_dtype="float32", donate_buffers=False,
        seed=0,
        tasks={"task0": {"id": 0, "name": "y", "act_fn": "sigmoid",
                         "metric": "auc"}})
    conf_f = config_from_dict(dict(base, score_impl="fast"))
    conf_p = config_from_dict(dict(base, score_impl="pallas"))

    rng = jax.random.PRNGKey(7)
    feats = jax.random.normal(jax.random.PRNGKey(8), (4, 16, 24))
    mask = jnp.ones((4, 16), bool)
    labels = {"y": jnp.asarray([[0.], [1.], [1.], [0.]])}
    weights = jnp.ones((4,), jnp.float32)

    outs = []
    for conf in (conf_f, conf_p):
        tr = IPSTrainer(conf, rng=jax.random.PRNGKey(1))
        loss, task_losses, _ = tr.fused_step(feats, mask, labels, weights,
                                             rng, 1e-3)
        outs.append((np.asarray(loss),
                     jax.tree_util.tree_leaves(tr.state.params)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
