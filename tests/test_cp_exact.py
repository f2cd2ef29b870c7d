"""Exact context parallelism: eager selection under mesh_patch > 1 must be
numerics-IDENTICAL to single-device (VERDICT round-4 item 4).

cp_select='exact' (the default) keeps `ips_select`'s single global stream
and only re-places the chunk encodes (shard the patch axis, re-replicate
the (B, n, D) embeddings for scoring). Encoding is per-patch, so the
selected INDICES must match single-device bit-for-bit; the train half's
gradient psum may reorder float sums, so losses compare to float32
rounding. The legacy approximate merge stays available as
cp_select='local_merge' (tests/test_parallel.py, tests/test_cp_fidelity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.train.steps import IPSTrainer
from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"),
    # Tier: 8-device shard_map equality suite -- full pass only.
    pytest.mark.slow,
]


def _mk_batch(conf, rng, B=None):
    B = B or conf.B
    patches = jax.random.uniform(
        rng, (B, conf.N, *conf.patch_size, conf.n_chan_in), jnp.float32)
    mask = jnp.ones((B, conf.N), bool)
    labels = {"majority": jnp.arange(B, dtype=jnp.int32) % conf.n_class,
              "multi": jnp.zeros((B, conf.n_class), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)
    return patches, mask, labels, weights


@pytest.fixture(scope="module")
def cp_conf(tiny_conf):
    # N=16 with M=8 >= N/mesh_patch=4: a shape 'local_merge' REJECTS, so
    # passing proves exact CP lifted the constraint.
    return tiny_conf.replace(B=4, B_seq=4, N=16, M=8, I=4, use_pos=True)


def _select_idx(trainer, patches, mask, rng):
    _, _, mem_idx, mem_mask = trainer.select(patches, mask, rng)
    return np.asarray(mem_idx), np.asarray(mem_mask)


class TestExactCP:
    def test_selection_indices_bitwise_equal_2x4(self, cp_conf):
        init = jax.random.PRNGKey(7)
        single = IPSTrainer(cp_conf, rng=init)
        sharded = ShardedIPSTrainer(
            cp_conf.replace(mesh_data=2, mesh_patch=4), rng=init)
        patches, mask, _, _ = _mk_batch(cp_conf, jax.random.PRNGKey(1))
        rng = jax.random.PRNGKey(2)
        idx_s, mask_s = _select_idx(single, patches, mask, rng)
        idx_m, mask_m = _select_idx(
            sharded, sharded.put_batch(patches, patch_dim=1), mask, rng)
        np.testing.assert_array_equal(idx_s, idx_m)
        np.testing.assert_array_equal(mask_s, mask_m)

    def test_fused_step_loss_matches_single_device(self, cp_conf):
        init = jax.random.PRNGKey(7)
        single = IPSTrainer(cp_conf, rng=init)
        sharded = ShardedIPSTrainer(
            cp_conf.replace(mesh_data=2, mesh_patch=4), rng=init)
        patches, mask, labels, w = _mk_batch(cp_conf, jax.random.PRNGKey(1))
        rng = jax.random.PRNGKey(3)
        loss_s, tl_s, _ = single.fused_step(patches, mask, labels, w,
                                            rng, 1e-3)
        b = sharded.put_batch({"p": patches, "m": mask}, patch_dim=1)
        lab = sharded.put_batch(labels)
        w_m = sharded.put_batch(w)
        loss_m, tl_m, _ = sharded.fused_step(b["p"], b["m"], lab, w_m,
                                             rng, 1e-3)
        np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=2e-5)
        for k in tl_s:
            np.testing.assert_allclose(float(tl_s[k]), float(tl_m[k]),
                                       rtol=2e-5)

    def test_preencode_true_exact_cp(self, cp_conf):
        # preencode_select=true is now ALLOWED under exact CP and must not
        # change the selection (it never does: encoding is per-patch)
        conf_pe = cp_conf.replace(preencode_select=True,
                                  mesh_data=2, mesh_patch=4)
        init = jax.random.PRNGKey(7)
        single = IPSTrainer(cp_conf, rng=init)
        sharded = ShardedIPSTrainer(conf_pe, rng=init)
        patches, mask, _, _ = _mk_batch(cp_conf, jax.random.PRNGKey(4))
        rng = jax.random.PRNGKey(5)
        idx_s, _ = _select_idx(single, patches, mask, rng)
        idx_m, _ = _select_idx(
            sharded, sharded.put_batch(patches, patch_dim=1), mask, rng)
        np.testing.assert_array_equal(idx_s, idx_m)

    def test_assembled_fused_exact_cp(self, cp_conf):
        # B_seq < B: the vmapped assembled selection must run the exact-CP
        # wrap inside vmap and match single-device bit-for-bit on indices
        conf = cp_conf.replace(B=4, B_seq=2)
        init = jax.random.PRNGKey(7)
        single = IPSTrainer(conf, rng=init)
        sharded = ShardedIPSTrainer(
            conf.replace(mesh_data=2, mesh_patch=4), rng=init)
        r = conf.B // conf.B_seq
        patches, mask, labels, w = _mk_batch(conf, jax.random.PRNGKey(6))
        p_r = patches.reshape(r, conf.B_seq, *patches.shape[1:])
        m_r = mask.reshape(r, conf.B_seq, conf.N)
        sel_rngs = jax.random.split(jax.random.PRNGKey(8), r)
        train_rng = jax.random.PRNGKey(9)
        loss_s, _, _ = single.fused_assembled_step(
            p_r, m_r, labels, w, sel_rngs, train_rng, 1e-3)
        loss_m, _, _ = sharded.fused_assembled_step(
            p_r, m_r, labels, w, sel_rngs, train_rng, 1e-3)
        np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=2e-5)

    def test_feature_mode_exact_cp(self, feat_conf):
        conf = feat_conf.replace(B=4, B_seq=4, N=32, M=8, I=8)
        init = jax.random.PRNGKey(7)
        single = IPSTrainer(conf, rng=init)
        sharded = ShardedIPSTrainer(
            conf.replace(mesh_data=2, mesh_patch=4), rng=init)
        rng = jax.random.PRNGKey(10)
        feats = jax.random.normal(rng, (4, 32, conf.n_chan_in))
        mask = jnp.ones((4, 32), bool)
        idx_s, _ = _select_idx(single, feats, mask, rng)
        idx_m, _ = _select_idx(
            sharded, sharded.put_batch(feats, patch_dim=1), mask, rng)
        np.testing.assert_array_equal(idx_s, idx_m)

    def test_local_merge_still_available_opt_in(self, cp_conf):
        conf = cp_conf.replace(M=2, I=4, cp_select="local_merge",
                               mesh_data=2, mesh_patch=4)
        sharded = ShardedIPSTrainer(conf, rng=jax.random.PRNGKey(7))
        patches, mask, _, _ = _mk_batch(conf, jax.random.PRNGKey(1))
        idx, msk = _select_idx(
            sharded, sharded.put_batch(patches, patch_dim=1), mask,
            jax.random.PRNGKey(2))
        assert idx.shape == (4, 2) and msk.all()

    def test_local_merge_m_constraint_kept(self, cp_conf):
        conf = cp_conf.replace(cp_select="local_merge",
                               mesh_data=2, mesh_patch=4)  # M=8 >= N/4
        with pytest.raises(ValueError, match="M < N/mesh_patch"):
            ShardedIPSTrainer(conf, rng=jax.random.PRNGKey(7))
