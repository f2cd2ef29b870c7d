"""Selection-engine equality fuzz: eager scan vs streaming vs grouped.

Broadens the single-shape equality tests in tests/test_streaming.py:
for each drawn (B, N, M, I, G, mask) the three engines must select the
same patches — the eager in-jit scan (`ops/selection.py`), the
host-chunked streaming engine, and the scanned grouped streaming engine
(`stream_chunk_group`) all implement the reference's iterative top-M
(reference architecture/ips_net.py:169-262), so shape edge cases
(ragged last chunk, single chunk, G > n_chunks, partial masks) must
never change the result.
"""

import jax
import numpy as np
import pytest

from ips_tpu.train.steps import IPSTrainer

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow


# (seed, B, N, M, I, G, masked) — shapes chosen to hit: ragged last
# chunk, single chunk, G dividing / not dividing / exceeding n_chunks
CASES = [
    (0, 1, 17, 3, 5, 2, False),
    (1, 2, 23, 6, 4, 3, True),
    (2, 3, 9, 4, 2, 4, True),
    (3, 2, 16, 8, 8, 2, False),   # exactly one chunk
    (4, 2, 11, 2, 3, 5, True),    # G > n_chunks: pure per-chunk fallback
    (5, 4, 40, 5, 7, 3, True),    # ragged last chunk + grouped tail mix
]


@pytest.mark.parametrize("seed,B,N,M,I,G,masked", CASES)
def test_engines_agree(feat_conf, seed, B, N, M, I, G, masked):
    conf = feat_conf.replace(B=B, B_seq=B, N=N, M=M, I=I,
                             stream_chunk_group=1)
    rng = jax.random.PRNGKey(100 + seed)
    feats = np.asarray(jax.random.normal(rng, (B, N, conf.n_chan_in)),
                       np.float32)
    if masked:
        # keep >= M valid per row so raw top-M arrays compare exactly
        m = np.ones((B, N), bool)
        drop = np.random.default_rng(seed).permutation(N)[:N - M]
        m[0, drop[:max(N - M - 2, 0)]] = False
        mask = m
    else:
        mask = None

    tr = IPSTrainer(conf, rng=jax.random.PRNGKey(7))
    tr_g = IPSTrainer(conf.replace(stream_chunk_group=G),
                      rng=jax.random.PRNGKey(7))

    args = (feats,) if mask is None else (feats, mask)
    eager = tr.select(*(jax.numpy.asarray(a) for a in args), rng=rng)
    stream = tr.select_streaming(feats, mask, rng)
    grouped = tr_g.select_streaming(feats, mask, rng)

    for other in (stream, grouped):
        np.testing.assert_array_equal(np.asarray(eager[2]),
                                      np.asarray(other[2]))
        np.testing.assert_array_equal(np.asarray(eager[3]),
                                      np.asarray(other[3]))
        np.testing.assert_allclose(np.asarray(eager[0]),
                                   np.asarray(other[0]), rtol=1e-6)


def test_engines_agree_short_rows(feat_conf):
    """Rows with FEWER than M valid patches: every engine must surface
    the same VALID selection (invalid slot contents are free — ties at
    masked scores — so compare the valid sets, not raw arrays)."""
    B, N, M, I = 3, 19, 6, 4
    conf = feat_conf.replace(B=B, B_seq=B, N=N, M=M, I=I,
                             stream_chunk_group=1)
    rng = jax.random.PRNGKey(42)
    feats = np.asarray(jax.random.normal(rng, (B, N, conf.n_chan_in)),
                       np.float32)
    mask = np.ones((B, N), bool)
    mask[0, 3:] = False          # only 3 valid < M=6
    mask[2, 10:] = False         # 10 valid > M

    tr = IPSTrainer(conf, rng=jax.random.PRNGKey(7))
    tr_g = IPSTrainer(conf.replace(stream_chunk_group=3),
                      rng=jax.random.PRNGKey(7))
    eager = tr.select(jax.numpy.asarray(feats), jax.numpy.asarray(mask),
                      rng)
    stream = tr.select_streaming(feats, mask, rng)
    grouped = tr_g.select_streaming(feats, mask, rng)

    def valid_sets(res):
        idx, val = np.asarray(res[2]), np.asarray(res[3])
        return [set(idx[b][val[b]].tolist()) for b in range(B)]

    ref = valid_sets(eager)
    assert valid_sets(stream) == ref
    assert valid_sets(grouped) == ref
    # row 0 keeps exactly its 3 valid patches
    assert ref[0] == {0, 1, 2}
