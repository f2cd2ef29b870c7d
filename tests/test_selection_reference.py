"""Property test: the jitted selection engine vs a brute-force numpy oracle.

The oracle implements the IPS specification directly from the reference's
documented behavior (architecture/ips_net.py:169-262): sequential chunks,
softmax-attention scores averaged over heads and tokens, top-M with
first-occurrence tie-breaking, scoring on emb+pos / buffer keeps raw emb.
Randomized over shapes, masks, and pos-enc usage.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.ops.selection import ips_select


def _np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


class Oracle:
    """Brute-force numpy IPS with a linear encoder and a real attention
    scorer (T tokens, H heads)."""

    def __init__(self, rng, feat_dim, D, T, H, Dk):
        self.W_enc = rng.normal(0, 0.5, (feat_dim, D)).astype(np.float64)
        self.q = rng.normal(0, 0.5, (T, H, Dk))
        self.Wk = rng.normal(0, 0.3, (D, H, Dk))
        self.Dk = Dk

    def encode(self, x):  # (..., feat) -> (..., D)
        return x.astype(np.float64) @ self.W_enc

    def scores(self, emb, valid):  # (B, L, D), (B, L) -> (B, L)
        k = np.einsum("bld,dhk->blhk", emb, self.Wk)
        logits = np.einsum("thk,blhk->bthl", self.q, k) / math.sqrt(self.Dk)
        logits = np.where(valid[:, None, None, :], logits, -1e9)
        attn = _np_softmax(logits, axis=-1)       # over L
        return attn.mean(axis=(1, 2))             # over T, H

    def select(self, patches, M, I, pos_table=None, mask=None):
        B, N = patches.shape[:2]
        if mask is None:
            mask = np.ones((B, N), bool)
        idx = np.arange(N)[None].repeat(B, 0)
        mem_idx = idx[:, :M].copy()
        mem_emb = self.encode(patches[:, :M])
        mem_valid = mask[:, :M].copy()
        pos = M
        while pos < N:
            end = min(pos + I, N)
            cand_idx = idx[:, pos:end]
            all_emb = np.concatenate(
                [mem_emb, self.encode(patches[:, pos:end])], 1)
            all_idx = np.concatenate([mem_idx, cand_idx], 1)
            all_valid = np.concatenate(
                [mem_valid, mask[:, pos:end]], 1)
            emb_s = (all_emb + pos_table[all_idx]
                     if pos_table is not None else all_emb)
            s = self.scores(emb_s, all_valid)
            s = np.where(all_valid, s, -1e9)
            # stable descending top-M (first occurrence on ties)
            order = np.argsort(-s, axis=1, kind="stable")[:, :M]
            mem_emb = np.take_along_axis(all_emb, order[..., None], 1)
            mem_idx = np.take_along_axis(all_idx, order, 1)
            mem_valid = np.take_along_axis(all_valid, order, 1)
            pos = end
        return mem_idx, mem_valid


@pytest.mark.parametrize("seed,B,N,M,I,feat,use_pos,frac_valid", [
    (0, 2, 17, 4, 5, 6, False, 1.0),
    (1, 3, 24, 6, 6, 4, True, 1.0),
    (2, 2, 30, 5, 7, 8, False, 0.6),
    (3, 1, 40, 8, 16, 5, True, 0.8),
    (4, 4, 12, 3, 4, 3, False, 1.0),
])
def test_engine_matches_numpy_oracle(seed, B, N, M, I, feat, use_pos,
                                     frac_valid):
    rng = np.random.default_rng(seed)
    D, T, H, Dk = 8, 2, 2, 4
    oracle = Oracle(rng, feat, D, T, H, Dk)
    patches = rng.normal(0, 1, (B, N, feat)).astype(np.float64)
    pos_table = (rng.normal(0, 0.3, (N, D)) if use_pos else None)
    mask = None
    if frac_valid < 1.0:
        mask = np.zeros((B, N), bool)
        n_valid = int(N * frac_valid)
        mask[:, :n_valid] = True

    expect_idx, expect_valid = oracle.select(patches, M, I, pos_table, mask)

    # jnp twins of the oracle's encoder/scorer, run in x64 so both sides
    # compute identical fp64 values (ties are then impossible w.p. 1)
    jax.config.update("jax_enable_x64", True)
    try:
        W = jnp.asarray(oracle.W_enc)
        q = jnp.asarray(oracle.q)
        Wk = jnp.asarray(oracle.Wk)

        def encode(x):
            return x.astype(jnp.float64) @ W

        def score(emb, valid):
            k = jnp.einsum("bld,dhk->blhk", emb, Wk)
            logits = jnp.einsum("thk,blhk->bthl", q, k) / math.sqrt(Dk)
            logits = jnp.where(valid[:, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            return attn.mean(axis=(1, 2))

        res = ips_select(
            encode, score, jnp.asarray(patches), M=M, I=I,
            pos_table=(jnp.asarray(pos_table)
                       if pos_table is not None else None),
            mask=(jnp.asarray(mask) if mask is not None else None))
        got_idx = np.asarray(res.mem_idx)
        got_valid = np.asarray(res.mem_mask)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_array_equal(got_idx, expect_idx)
    np.testing.assert_array_equal(got_valid, expect_valid)
