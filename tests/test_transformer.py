"""Golden-value tests for the cross-attention transformer.

Each test re-computes the expected result with an independent numpy
implementation of the reference math (reference architecture/transformer.py)
using the actual initialized parameters.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.models.transformer import (CrossAttnTransformer, pos_enc_1d)

B, L, D, H, DK, DV, T, DI = 2, 7, 16, 4, 8, 8, 3, 32


@pytest.fixture(scope="module")
def model_and_params():
    m = CrossAttnTransformer(n_token=T, H=H, D=D, D_k=DK, D_v=DV, D_inner=DI,
                             attn_dropout=0.1, dropout=0.1)
    x = jnp.zeros((1, L, D))
    variables = m.init(jax.random.PRNGKey(1), x)
    return m, variables


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_attn(params, x, mask=None):
    """Independent numpy re-derivation of the attention weights."""
    p = jax.tree.map(np.asarray, params)
    att = p["crs_attn"]
    q = att["q"]                                 # (1, T, D)
    qh = (q @ att["q_w"]["kernel"]).reshape(1, T, H, DK).transpose(0, 2, 1, 3)
    kh = (x @ att["k_w"]["kernel"]).reshape(B, L, H, DK).transpose(0, 2, 1, 3)
    logits = np.einsum("xhtd,bhld->bhtl", qh, kh) / math.sqrt(DK)
    if mask is not None:
        logits = np.where(mask[:, None, None, :], logits, -1e9)
    return _np_softmax(logits, -1)


def test_pos_enc_golden():
    pe = np.asarray(pos_enc_1d(8, 5))
    pos = np.arange(5)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, 8, 2) * -(math.log(10000.0) / 8))
    expect = np.zeros((5, 8))
    expect[:, 0::2] = np.sin(pos * div)
    expect[:, 1::2] = np.cos(pos * div)
    np.testing.assert_allclose(pe, expect, rtol=1e-6)


def test_scores_match_numpy(model_and_params):
    m, variables = model_and_params
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, L, D)))
    got = np.asarray(m.apply(variables, jnp.asarray(x),
                             method=CrossAttnTransformer.get_scores))
    attn = _np_attn(variables["params"], x)       # (B, H, T, L)
    # mean over heads then tokens (reference transformer.py:143-148)
    expect = attn.mean(axis=1).mean(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    # scores over candidates sum to 1 (softmax rows averaged)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_scores_masked(model_and_params):
    m, variables = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (B, L, D))
    mask = np.ones((B, L), bool)
    mask[:, -2:] = False
    got = np.asarray(m.apply(variables, x, jnp.asarray(mask),
                             method=CrossAttnTransformer.get_scores))
    assert (got[:, -2:] < 1e-6).all()
    # masked scores equal scores computed on the truncated input
    got_trunc = np.asarray(m.apply(variables, x[:, :-2],
                                   method=CrossAttnTransformer.get_scores))
    np.testing.assert_allclose(got[:, :-2], got_trunc, rtol=1e-5, atol=1e-6)


def test_forward_matches_numpy(model_and_params):
    m, variables = model_and_params
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (B, L, D)))
    got = np.asarray(m.apply(variables, jnp.asarray(x)))  # deterministic

    p = jax.tree.map(np.asarray, variables["params"])
    att = p["crs_attn"]
    attn = _np_attn(variables["params"], x)              # (B, H, T, L)
    vh = (x @ att["v_w"]["kernel"]).reshape(B, L, H, DV).transpose(0, 2, 1, 3)
    out = np.einsum("bhtl,bhld->bhtd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * DV)
    out = out @ att["fc"]["kernel"]
    out = out + att["q"]                                 # residual on raw q
    mu = out.mean(-1, keepdims=True)
    var = out.var(-1, keepdims=True)
    out = (out - mu) / np.sqrt(var + 1e-6)
    out = out * att["layer_norm"]["scale"] + att["layer_norm"]["bias"]

    mlp = p["mlp"]
    h = np.maximum(out @ mlp["w_1"]["kernel"] + mlp["w_1"]["bias"], 0.0)
    h = h @ mlp["w_2"]["kernel"] + mlp["w_2"]["bias"]
    h = h + out
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-6)
    expect = h * mlp["layer_norm"]["scale"] + mlp["layer_norm"]["bias"]

    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_dropout_active_in_train(model_and_params):
    m, variables = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (B, L, D))
    det = m.apply(variables, x, None, True)
    r1 = m.apply(variables, x, None, False,
                 rngs={"dropout": jax.random.PRNGKey(6)})
    r2 = m.apply(variables, x, None, False,
                 rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(r1), np.asarray(det))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_q_init_range(model_and_params):
    _, variables = model_and_params
    q = np.asarray(variables["params"]["crs_attn"]["q"])
    bound = math.sqrt(1.0 / DK)
    assert q.shape == (1, T, D)
    assert (np.abs(q) <= bound).all()
    assert q.std() > 0.1 * bound
