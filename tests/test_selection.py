"""Unit tests for the IPS selection engine (ops/selection.py).

Uses trivial encoder/scorer closures so every expected result can be
computed by hand; exercises every semantic carried over from the reference
loop (architecture/ips_net.py:169-262).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.ops.selection import (ips_select, ips_select_streaming_step,
                                   select_top_m)
from ips_tpu.ops.shuffle import make_permutation


def _value_encode(x):
    """Patch value -> 2-dim embedding equal to the value."""
    return jnp.concatenate([x, x], axis=-1)


def _value_score(emb, mask):
    return emb[..., 0]


def _vals(B, N):
    """patches[b, i] has scalar value i."""
    return jnp.broadcast_to(jnp.arange(N, dtype=jnp.float32)[None, :, None],
                            (B, N, 1))


class TestGreedyTopM:
    def test_selects_global_top_m(self):
        res = ips_select(_value_encode, _value_score, _vals(2, 12), M=3, I=4)
        np.testing.assert_array_equal(np.asarray(res.mem_idx),
                                      [[11, 10, 9]] * 2)
        np.testing.assert_array_equal(np.asarray(res.mem_patch)[..., 0],
                                      [[11, 10, 9]] * 2)
        assert np.asarray(res.mem_mask).all()

    def test_ragged_tail_chunk(self):
        # N - M = 7 not divisible by I=3: index-padded tail must not
        # contaminate selection (reference handles this by a short last
        # chunk, ips_net.py:220-221).
        res = ips_select(_value_encode, _value_score, _vals(1, 10), M=3, I=3)
        np.testing.assert_array_equal(np.asarray(res.mem_idx), [[9, 8, 7]])

    def test_shortcut_m_ge_n(self):
        patches = _vals(2, 5)
        res = ips_select(_value_encode, _value_score, patches, M=5, I=2,
                         rng=jax.random.PRNGKey(0), shuffle=True)
        # All patches returned unshuffled in original order
        # (reference ips_net.py:184-188; shuffle happens after the check).
        np.testing.assert_array_equal(np.asarray(res.mem_idx),
                                      [[0, 1, 2, 3, 4]] * 2)
        np.testing.assert_array_equal(np.asarray(res.mem_patch), patches)

    @pytest.mark.parametrize("unroll", [2, 4, 8])
    def test_unroll_is_semantics_identical(self, unroll, tiny_conf):
        """lax.scan unroll must not change selection — bit-identical
        memory through the REAL encoder/scorer, including a ragged tail."""
        from ips_tpu.train.steps import IPSTrainer
        conf = tiny_conf.replace(N=23, M=4, I=3)
        rng = jax.random.PRNGKey(5)
        patches = jax.random.uniform(rng, (2, 23, 16, 16, 1))
        base = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
        other = IPSTrainer(conf.replace(select_unroll=unroll),
                           rng=jax.random.PRNGKey(0))
        a = base.select(patches, rng=rng)
        b = other.select(patches, rng=rng)
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_order_is_score_descending(self):
        res = ips_select(_value_encode, _value_score, _vals(1, 20), M=4, I=4)
        idx = np.asarray(res.mem_idx)[0]
        assert list(idx) == [19, 18, 17, 16]


class TestMasking:
    def test_padded_patches_never_selected(self):
        # 12 slots, only 7 valid; top-3 among valid = 6, 5, 4.
        mask = jnp.arange(12)[None, :] < 7
        res = ips_select(_value_encode, _value_score, _vals(1, 12), M=3, I=4,
                         mask=mask)
        np.testing.assert_array_equal(np.asarray(res.mem_idx), [[6, 5, 4]])
        assert np.asarray(res.mem_mask).all()

    def test_fewer_valid_than_m(self):
        # Only 2 valid patches but M=4: invalid selections flagged in mask.
        mask = jnp.arange(12)[None, :] < 2
        res = ips_select(_value_encode, _value_score, _vals(1, 12), M=4, I=4,
                         mask=mask)
        m = np.asarray(res.mem_mask)[0]
        idx = np.asarray(res.mem_idx)[0]
        assert m.sum() == 2
        assert set(idx[m]) == {0, 1}

    def test_mixed_batch_masks(self):
        mask = jnp.stack([jnp.arange(12) < 12, jnp.arange(12) < 5])
        res = ips_select(_value_encode, _value_score, _vals(2, 12), M=3, I=4,
                         mask=mask)
        np.testing.assert_array_equal(np.asarray(res.mem_idx),
                                      [[11, 10, 9], [4, 3, 2]])


class TestShuffle:
    def test_batch_perm_shared_across_rows(self):
        perm = make_permutation(jax.random.PRNGKey(0), 4, 16, None, True,
                                "batch")
        p = np.asarray(perm)
        assert (p == p[0]).all()
        assert sorted(p[0]) == list(range(16))

    def test_instance_perm_differs(self):
        perm = make_permutation(jax.random.PRNGKey(0), 4, 64, None, True,
                                "instance")
        p = np.asarray(perm)
        assert not (p[0] == p[1]).all()
        for row in p:
            assert sorted(row) == list(range(64))

    def test_padded_slots_sink_to_end(self):
        mask = jnp.arange(10)[None, :].repeat(3, 0) < 6
        perm = make_permutation(jax.random.PRNGKey(1), 3, 10, mask, True,
                                "instance")
        p = np.asarray(perm)
        assert (p[:, 6:] >= 6).all() and (p[:, :6] < 6).all()

    def test_no_shuffle_identity(self):
        perm = make_permutation(None, 2, 8, None, False, "batch")
        np.testing.assert_array_equal(np.asarray(perm),
                                      np.arange(8)[None].repeat(2, 0))

    def test_selection_invariant_to_shuffle_without_ties(self):
        # With strictly distinct scores the selected SET must not depend on
        # the shuffle (only tie-breaking does).
        for seed in range(3):
            res = ips_select(_value_encode, _value_score, _vals(1, 15),
                             M=4, I=5, rng=jax.random.PRNGKey(seed),
                             shuffle=True, shuffle_style="instance")
            assert set(np.asarray(res.mem_idx)[0]) == {14, 13, 12, 11}

    def test_shuffle_randomizes_ties(self):
        # All-equal scores: selection keeps the first M candidates seen, so
        # the shuffle determines the winners (reference ips_net.py:199-201).
        ties = jnp.ones((1, 16, 1))
        seen = set()
        for seed in range(8):
            res = ips_select(_value_encode, _value_score, ties, M=2, I=4,
                             rng=jax.random.PRNGKey(seed), shuffle=True,
                             shuffle_style="batch")
            seen.add(tuple(sorted(np.asarray(res.mem_idx)[0].tolist())))
        assert len(seen) > 1


class TestPosEncAsymmetry:
    def test_scoring_uses_pos_buffer_keeps_raw(self):
        # Scorer reads only the pos-enc'ed component; craft pos_table so
        # scoring REVERSES the value ranking. Selection must follow the
        # pos-enc'ed scores (reference ips_net.py:233-241) while returning
        # raw patches.
        N = 10
        pos_table = -2.0 * jnp.arange(N, dtype=jnp.float32)[:, None].repeat(2, 1)
        res = ips_select(_value_encode, _value_score, _vals(1, N), M=3, I=3,
                         pos_table=pos_table)
        # emb + pos = i - 2i = -i -> top-3 are the SMALLEST indices
        # reachable: memory starts with {0,1,2} and nothing beats them.
        np.testing.assert_array_equal(np.asarray(res.mem_idx), [[0, 1, 2]])
        # raw patch values returned, not pos-enc'ed
        np.testing.assert_array_equal(np.asarray(res.mem_patch)[..., 0],
                                      [[0, 1, 2]])
        # mem_pos gathered by original index
        np.testing.assert_allclose(np.asarray(res.mem_pos),
                                   np.asarray(pos_table)[[0, 1, 2]][None])

    def test_mem_pos_matches_indices_after_shuffle(self):
        N, D = 12, 2
        pos_table = jnp.arange(N, dtype=jnp.float32)[:, None].repeat(D, 1) * 10
        res = ips_select(_value_encode, _value_score, _vals(1, N), M=3, I=3,
                         pos_table=pos_table, rng=jax.random.PRNGKey(3),
                         shuffle=True, shuffle_style="batch")
        idx = np.asarray(res.mem_idx)[0]
        np.testing.assert_allclose(np.asarray(res.mem_pos)[0],
                                   np.asarray(pos_table)[idx])


class TestStreamingStep:
    def test_streaming_equals_scan(self):
        """The host-loop (lazy) path must produce the scan (eager) result."""
        B, N, M, I = 2, 14, 3, 4
        patches = _vals(B, N)
        res = ips_select(_value_encode, _value_score, patches, M=M, I=I)

        mem_idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        mem_emb = _value_encode(patches[:, :M])
        mem_valid = jnp.ones((B, M), bool)
        pos = M
        while pos < N:
            end = min(pos + I, N)
            chunk = patches[:, pos:end]
            cidx = jnp.broadcast_to(jnp.arange(pos, end, dtype=jnp.int32),
                                    (B, end - pos))
            cvalid = jnp.ones((B, end - pos), bool)
            if end - pos < I:  # pad the short tail like a host loop would
                pad = I - (end - pos)
                chunk = jnp.pad(chunk, ((0, 0), (0, pad), (0, 0)))
                cidx = jnp.pad(cidx, ((0, 0), (0, pad)))
                cvalid = jnp.pad(cvalid, ((0, 0), (0, pad)))
            mem_emb, mem_idx, mem_valid = ips_select_streaming_step(
                _value_encode, _value_score, mem_emb, mem_idx, mem_valid,
                chunk, cidx, cvalid, M)
            pos = end
        np.testing.assert_array_equal(np.asarray(mem_idx),
                                      np.asarray(res.mem_idx))


def test_select_top_m_stable_ties():
    # Equal scores: top_k keeps lowest candidate position first, matching
    # torch.topk's first-occurrence behavior (reference ips_net.py:148).
    emb = jnp.ones((1, 6, 2))
    idx = jnp.arange(6, dtype=jnp.int32)[None]
    valid = jnp.ones((1, 6), bool)
    _, top_idx, _ = select_top_m(emb, emb, idx, valid, 3,
                                 lambda e, m: jnp.ones(e.shape[:2]))
    np.testing.assert_array_equal(np.asarray(top_idx), [[0, 1, 2]])


def test_no_gradient_through_selection():
    def loss(scale):
        patches = _vals(1, 8) * scale
        res = ips_select(_value_encode, _value_score, patches, M=2, I=3)
        return res.mem_patch.sum()

    g = jax.grad(loss)(jnp.float32(1.0))
    assert float(g) == 0.0


class TestPrepermute:
    def test_equivalent_to_gather_path(self):
        for seed in range(3):
            rng = jax.random.PRNGKey(seed)
            patches = jax.random.uniform(rng, (2, 23, 3))
            kw = dict(M=4, I=5, rng=rng, shuffle=True,
                      shuffle_style="instance")
            a = ips_select(_value_encode, _value_score, patches,
                           prepermute=False, **kw)
            b = ips_select(_value_encode, _value_score, patches,
                           prepermute=True, **kw)
            np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                          np.asarray(b.mem_idx))
            np.testing.assert_allclose(np.asarray(a.mem_patch),
                                       np.asarray(b.mem_patch))

    def test_equivalent_with_mask_and_pos(self):
        pos = jnp.arange(20, dtype=jnp.float32)[:, None].repeat(2, 1) * 0.1
        mask = jnp.arange(20)[None, :].repeat(2, 0) < 15
        a = ips_select(_value_encode, _value_score, _vals(2, 20), M=3, I=4,
                       pos_table=pos, mask=mask, prepermute=False)
        b = ips_select(_value_encode, _value_score, _vals(2, 20), M=3, I=4,
                       pos_table=pos, mask=mask, prepermute=True)
        np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                      np.asarray(b.mem_idx))
        np.testing.assert_allclose(np.asarray(a.mem_pos),
                                   np.asarray(b.mem_pos))


class TestPreencode:
    """preencode=True must produce the IDENTICAL selection: encoding is
    per-patch, so caching all N embeddings up front changes dispatch
    structure only, never the scan's candidate sets."""

    def test_equivalent_to_chunked_path(self):
        for seed in range(3):
            rng = jax.random.PRNGKey(seed)
            patches = jax.random.uniform(rng, (2, 23, 3))
            kw = dict(M=4, I=5, rng=rng, shuffle=True,
                      shuffle_style="instance")
            a = ips_select(_value_encode, _value_score, patches,
                           preencode=False, **kw)
            b = ips_select(_value_encode, _value_score, patches,
                           preencode=True, **kw)
            np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                          np.asarray(b.mem_idx))
            np.testing.assert_allclose(np.asarray(a.mem_patch),
                                       np.asarray(b.mem_patch))

    def test_equivalent_with_mask_pos_and_real_model(self, tiny_conf, rng):
        """Real encoder/scorer closures, mask + pos table."""
        from ips_tpu.train.steps import IPSTrainer
        conf = tiny_conf.replace(donate_buffers=False)
        trainer = IPSTrainer(conf, rng=rng)
        encode, score = trainer._enc_score_fns(trainer.state.params,
                                               trainer.state.batch_stats)
        pos = trainer._pos_table_const()
        patches = jax.random.uniform(rng, (3, conf.N, 16, 16, 1))
        mask = jnp.arange(conf.N)[None, :].repeat(3, 0) < conf.N - 2
        kw = dict(M=conf.M, I=conf.I, pos_table=pos, mask=mask, rng=rng,
                  shuffle=True, shuffle_style="batch")
        a = ips_select(encode, score, patches, preencode=False, **kw)
        b = ips_select(encode, score, patches, preencode=True, **kw)
        np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                      np.asarray(b.mem_idx))
        np.testing.assert_allclose(np.asarray(a.mem_emb or a.mem_patch),
                                   np.asarray(b.mem_emb or b.mem_patch),
                                   rtol=1e-5, atol=1e-5)


class TestPreencodeChunked:
    """preencode_chunked builds the embedding table with a scan of
    contiguous-slice encodes (bounded activation memory for conv
    encoders); selection must be identical to both the chunked-gather
    path and the one-shot preencode, including when N % I != 0 (the
    encode scan pads the tail and slices it off)."""

    def test_equivalent_all_variants(self):
        for N in (23, 20):               # 23: ragged encode tail; 20: exact
            rng = jax.random.PRNGKey(N)
            patches = jax.random.uniform(rng, (2, N, 3))
            kw = dict(M=4, I=5, rng=rng, shuffle=True,
                      shuffle_style="instance")
            a = ips_select(_value_encode, _value_score, patches,
                           preencode=False, **kw)
            b = ips_select(_value_encode, _value_score, patches,
                           preencode=True, preencode_chunked=True, **kw)
            c = ips_select(_value_encode, _value_score, patches,
                           preencode=True, preencode_chunked=False, **kw)
            np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                          np.asarray(b.mem_idx))
            np.testing.assert_array_equal(np.asarray(c.mem_idx),
                                          np.asarray(b.mem_idx))
            np.testing.assert_allclose(np.asarray(a.mem_patch),
                                       np.asarray(b.mem_patch))

    def test_equivalent_with_real_conv_encoder(self, tiny_conf, rng):
        from ips_tpu.train.steps import IPSTrainer
        conf = tiny_conf.replace(donate_buffers=False, N=14, M=4, I=4)
        trainer = IPSTrainer(conf, rng=rng)
        encode, score = trainer._enc_score_fns(trainer.state.params,
                                               trainer.state.batch_stats)
        patches = jax.random.uniform(rng, (2, 14, 16, 16, 1))
        kw = dict(M=4, I=4, rng=rng, shuffle=True, shuffle_style="batch")
        a = ips_select(encode, score, patches, preencode=False, **kw)
        b = ips_select(encode, score, patches, preencode=True,
                       preencode_chunked=True, **kw)
        np.testing.assert_array_equal(np.asarray(a.mem_idx),
                                      np.asarray(b.mem_idx))
        np.testing.assert_allclose(np.asarray(a.mem_patch),
                                   np.asarray(b.mem_patch), rtol=1e-6)


class TestDerivedValidity:
    """The two gather-free validity computations (selection.py) must equal
    the take_along_axis formulations they replaced (1-byte-row gathers cost
    ~10 ns/element on TPU — 2.4 ms/step at camelyon scale for zero
    information: validity is derivable)."""

    @pytest.mark.parametrize("shuffle,style", [(False, "batch"),
                                               (True, "batch"),
                                               (True, "instance")])
    def test_perm_valid_is_position_lt_n_valid(self, shuffle, style):
        # make_permutation's contract: every valid patch precedes every
        # padded slot, so validity along the permuted order is a prefix.
        B, N = 4, 17
        rng = jax.random.PRNGKey(3)
        mask = jax.random.uniform(jax.random.PRNGKey(7), (B, N)) > 0.4
        perm = make_permutation(rng, B, N, mask, shuffle, style)
        gathered = np.take_along_axis(np.asarray(mask), np.asarray(perm),
                                      axis=1)
        n_valid = np.asarray(mask).sum(axis=1)
        derived = np.arange(N)[None, :] < n_valid[:, None]
        np.testing.assert_array_equal(gathered, derived)

    def test_mem_valid_matches_gathered_validity(self):
        # select_top_m derives kept-validity from the kept scores (invalid
        # candidates score exactly NEG_INF); must equal gathering `valid`
        # by top_pos, including rows with fewer valid candidates than M.
        from ips_tpu.constants import NEG_INF
        B, L, M = 3, 12, 5
        key = jax.random.PRNGKey(11)
        emb = jax.random.normal(key, (B, L, 2))
        idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
        valid = jnp.array([[True] * 12,
                           [True] * 3 + [False] * 9,
                           [False] * 12])

        def score(e, m):
            return e[..., 0]

        mem_emb, mem_idx, mem_valid = select_top_m(emb, emb, idx, valid, M,
                                                   score)
        scores = np.where(np.asarray(valid), np.asarray(emb[..., 0]),
                          NEG_INF)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :M]
        expected_valid = np.take_along_axis(np.asarray(valid), order, axis=1)
        np.testing.assert_array_equal(np.asarray(mem_valid), expected_valid)
        # and the selected rows still match the gathered formulation
        np.testing.assert_array_equal(
            np.asarray(mem_idx)[np.asarray(mem_valid)],
            np.take_along_axis(np.asarray(idx), order, axis=1)[
                expected_valid])
