"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.ops.selection import ips_select
from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer, ips_select_cp
from ips_tpu.parallel.mesh import make_mesh, replicate, shard_batch

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



def _value_encode(x):
    return jnp.concatenate([x, x], axis=-1)


def _value_score(emb, mask):
    return emb[..., 0]


def _vals(B, N):
    return jnp.broadcast_to(jnp.arange(N, dtype=jnp.float32)[None, :, None],
                            (B, N, 1))


class TestMesh:
    def test_make_mesh_shapes(self):
        assert len(jax.devices()) == 8
        m = make_mesh(4, 2)
        assert m.shape == {"data": 4, "patch": 2}
        with pytest.raises(ValueError):
            make_mesh(8, 2)

    def test_shard_and_replicate(self):
        m = make_mesh(4, 2)
        x = jnp.zeros((8, 16, 3))
        xs = shard_batch(m, {"a": x})["a"]
        assert xs.sharding.spec[0] == "data"
        xr = replicate(m, x)
        assert xr.sharding.is_fully_replicated


class TestContextParallelSelection:
    def test_cp_matches_single_with_set_independent_scores(self):
        # With a set-independent scorer, local top-M + merge must equal the
        # single-stream selection's final set.
        B, N, M, I = 2, 32, 3, 4
        single = ips_select(_value_encode, _value_score, _vals(B, N), M=M,
                            I=I)
        cp = ips_select_cp(_value_encode, _value_score, _vals(B, N), M=M,
                           I=I, n_shards=4)
        np.testing.assert_array_equal(np.asarray(cp.mem_idx),
                                      np.asarray(single.mem_idx))
        np.testing.assert_array_equal(np.asarray(cp.mem_patch),
                                      np.asarray(single.mem_patch))

    def test_cp_masks_respected(self):
        mask = jnp.arange(32)[None, :].repeat(2, 0) < 20
        cp = ips_select_cp(_value_encode, _value_score, _vals(2, 32), M=3,
                           I=4, n_shards=4, mask=mask)
        np.testing.assert_array_equal(np.asarray(cp.mem_idx),
                                      [[19, 18, 17]] * 2)

    def test_cp_rejects_small_shards(self):
        with pytest.raises(ValueError, match="M < N/n_shards"):
            ips_select_cp(_value_encode, _value_score, _vals(1, 16), M=4,
                          I=4, n_shards=4)
        with pytest.raises(ValueError, match="not divisible"):
            ips_select_cp(_value_encode, _value_score, _vals(1, 30), M=2,
                          I=4, n_shards=4)

    def test_cp_runs_under_mesh(self):
        # Execute with the patch axis actually sharded over devices.
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(2, 4)
        patches = jax.device_put(_vals(2, 32),
                                 NamedSharding(mesh, P("data", "patch")))
        cp = jax.jit(lambda p: ips_select_cp(
            _value_encode, _value_score, p, M=3, I=4, n_shards=4).mem_idx)(
                patches)
        np.testing.assert_array_equal(np.asarray(cp), [[31, 30, 29]] * 2)


class TestShardedTrainer:
    def test_dp_fused_step_runs_and_matches_semantics(self, tiny_conf):
        conf = tiny_conf.replace(B=8, B_seq=8, mesh_data=8, mesh_patch=1,
                                 donate_buffers=False)
        trainer = ShardedIPSTrainer(conf)
        rng = jax.random.PRNGKey(0)
        patches = jax.random.uniform(rng, (8, conf.N, 16, 16, 1))
        mask = jnp.ones((8, conf.N), bool)
        labels = {"majority": jnp.arange(8, dtype=jnp.int32) % conf.n_class,
                  "multi": jnp.zeros((8, conf.n_class), jnp.float32)}
        w = jnp.ones((8,), jnp.float32)
        batch = shard_batch(trainer.mesh,
                            {"p": patches, "m": mask, "w": w, **labels})
        loss, task_losses, _ = trainer.fused_step(
            batch["p"], batch["m"],
            {"majority": batch["majority"], "multi": batch["multi"]},
            batch["w"], rng, 1e-3)
        assert np.isfinite(float(loss))
        # params remain replicated after the update
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_fused_eval_sharded_4x2(self, tiny_conf):
        conf = tiny_conf.replace(B=4, B_seq=4, N=16, M=3, I=4, mesh_data=4,
                                 mesh_patch=2, donate_buffers=False)
        trainer = ShardedIPSTrainer(conf)
        rng = jax.random.PRNGKey(2)
        batch = trainer.put_batch(
            {"p": jax.random.uniform(rng, (4, 16, 16, 16, 1)),
             "m": jnp.ones((4, 16), bool)}, patch_dim=1)
        labels = trainer.put_batch(
            {"majority": jnp.arange(4, dtype=jnp.int32) % conf.n_class,
             "multi": jnp.zeros((4, conf.n_class), jnp.float32)})
        w = trainer.put_batch(jnp.ones((4,), jnp.float32))
        loss, task_losses, preds = trainer.fused_eval_step(
            batch["p"], batch["m"], labels, w, rng)
        assert np.isfinite(float(loss))
        assert preds["majority"].shape == (4, conf.n_class)

    def test_fused_sparse_sharded_4x2(self, tiny_conf):
        conf = tiny_conf.replace(B=4, B_seq=4, N=16, M=3, I=4, mesh_data=4,
                                 mesh_patch=2, donate_buffers=False)
        trainer = ShardedIPSTrainer(conf)
        rng = jax.random.PRNGKey(3)
        # 64x64 image, 16x16 patches -> N=16; a handful of nonzeros per row.
        nnz = 32
        flat_idx = jax.random.randint(rng, (4, nnz), 0, 64 * 64)
        values = jax.random.uniform(rng, (4, nnz))
        put = trainer.put_batch({"i": flat_idx, "v": values})
        mask = trainer.put_batch({"m": jnp.ones((4, 16), bool)},
                                 patch_dim=1)["m"]
        labels = trainer.put_batch(
            {"majority": jnp.arange(4, dtype=jnp.int32) % conf.n_class,
             "multi": jnp.zeros((4, conf.n_class), jnp.float32)})
        w = trainer.put_batch(jnp.ones((4,), jnp.float32))
        loss, _, _ = trainer.fused_sparse_step(
            put["i"], put["v"], (64, 64), mask, labels, w, rng, 1e-3)
        assert np.isfinite(float(loss))
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_streaming_select_sharded(self, tiny_conf):
        conf = tiny_conf.replace(B=4, B_seq=4, N=16, M=3, I=4, mesh_data=4,
                                 mesh_patch=2, donate_buffers=False)
        trainer = ShardedIPSTrainer(conf)
        patches = np.random.default_rng(0).random((4, 16, 16, 16, 1),
                                                  np.float32)
        mem_patch, mem_pos, mem_idx, mem_mask = trainer.select_streaming(
            patches, rng=jax.random.PRNGKey(4))
        assert mem_patch.shape == (4, 3, 16, 16, 1)
        # streamed buffers land sharded over the data axis
        assert mem_patch.sharding.spec[0] == "data"
        idx = np.asarray(mem_idx)
        assert (idx >= 0).all() and (idx < 16).all()

    def test_dp_cp_mesh_select(self, tiny_conf):
        conf = tiny_conf.replace(B=4, B_seq=4, N=16, M=3, I=4, mesh_data=2,
                                 mesh_patch=4, use_pos=True,
                                 donate_buffers=False)
        trainer = ShardedIPSTrainer(conf)
        rng = jax.random.PRNGKey(1)
        patches = jax.random.uniform(rng, (4, 16, 16, 16, 1))
        mem_patch, mem_pos, mem_idx, mem_mask = trainer.select(patches,
                                                               rng=rng)
        assert mem_patch.shape == (4, 3, 16, 16, 1)
        assert mem_pos.shape == (4, 3, conf.D)
        idx = np.asarray(mem_idx)
        assert (idx >= 0).all() and (idx < 16).all()
        # selected positions' pos-enc rows must match their indices
        table = np.asarray(trainer.pos_table)
        np.testing.assert_allclose(np.asarray(mem_pos)[0], table[idx[0]],
                                   rtol=1e-6)

    def test_feature_mode_ln_fold_sharded_4x2(self, feat_conf):
        # camelyon product shape under the mesh: feature-mode projector
        # with the LN->GEMM fold vs the exact path — same init rng gives
        # the same param tree (tests/test_encoders.py TestLNFold), so the
        # two losses must agree to float32 rounding under dp x cp sharding
        losses = {}
        for fold in (False, True):
            conf = feat_conf.replace(B=4, B_seq=4, N=32, M=8, I=8,
                                     mesh_data=4, mesh_patch=2,
                                     ln_fold=fold, donate_buffers=False)
            trainer = ShardedIPSTrainer(conf, rng=jax.random.PRNGKey(5))
            rng = jax.random.PRNGKey(6)
            batch = trainer.put_batch(
                {"p": jax.random.normal(rng, (4, 32, conf.n_chan_in)),
                 "m": jnp.ones((4, 32), bool)}, patch_dim=1)
            labels = trainer.put_batch(
                {"metastases": jnp.zeros((4, 1), jnp.float32)})
            w = trainer.put_batch(jnp.ones((4,), jnp.float32))
            loss, _, _ = trainer.fused_step(batch["p"], batch["m"], labels,
                                            w, rng, 1e-3)
            assert np.isfinite(float(loss))
            leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
            assert leaf.sharding.is_fully_replicated
            losses[fold] = float(loss)
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=1e-4, atol=1e-5)
