"""Eval/inference embedding reuse (conf.eval_reuse_emb) is EXACT.

Selection runs the encoder in eval mode (frozen batch statistics, no
dropout), so the eval forward's re-encode of the M survivors (reference
architecture/ips_net.py:264-283) recomputes the values the selection
buffer already holds. These tests assert the reuse path (skip the patch
gather + encoder pass) produces the same losses/preds as the
reference-shaped re-encode on every eval path it serves: fused, sparse
fused, assembled, streaming, inference, and under a device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.train.steps import IPSTrainer

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



def _assert_same(out_a, out_b, atol=1e-6):
    loss_a, tl_a, preds_a = out_a
    loss_b, tl_b, preds_b = out_b
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                               rtol=0, atol=atol)
    for k in tl_a:
        np.testing.assert_allclose(np.asarray(tl_a[k]), np.asarray(tl_b[k]),
                                   rtol=0, atol=atol)
    for k in preds_a:
        np.testing.assert_allclose(np.asarray(preds_a[k]),
                                   np.asarray(preds_b[k]),
                                   rtol=0, atol=atol)


def _image_batch(conf, np_rng=None):
    r = np.random.default_rng(3)
    ph, pw = conf.patch_size
    patches = r.normal(0, 1, (conf.B, conf.N, ph, pw,
                              conf.n_chan_in)).astype(np.float32)
    mask = np.ones((conf.B, conf.N), bool)
    labels = {"majority": r.integers(0, conf.n_class, conf.B),
              "multi": r.integers(0, 2, (conf.B, conf.n_class))}
    weights = np.ones(conf.B, np.float32)
    return patches, mask, labels, weights


def test_fused_eval_matches_reencode(tiny_conf):
    conf = tiny_conf
    patches, mask, labels, weights = _image_batch(conf)
    rng = jax.random.PRNGKey(7)

    on = IPSTrainer(conf.replace(eval_reuse_emb=True))
    off = IPSTrainer(conf.replace(eval_reuse_emb=False))
    out_on = on.fused_eval_step(patches, mask, labels, weights, rng)
    out_off = off.fused_eval_step(patches, mask, labels, weights, rng)
    _assert_same(out_on, out_off)


def test_fused_eval_matches_feature_mode(feat_conf):
    conf = feat_conf.replace(B_seq=4, mask_padding=True, ln_fold=True)
    r = np.random.default_rng(5)
    N = 20
    feats = r.normal(0, 1, (conf.B, N, conf.n_chan_in)).astype(np.float32)
    mask = np.ones((conf.B, N), bool)
    mask[:, 15:] = False                      # bucketed padding rows
    labels = {"metastases": r.integers(0, 2, conf.B)}
    weights = np.ones(conf.B, np.float32)
    rng = jax.random.PRNGKey(1)

    on = IPSTrainer(conf.replace(eval_reuse_emb=True))
    off = IPSTrainer(conf.replace(eval_reuse_emb=False))
    out_on = on.fused_eval_step(feats, mask, labels, weights, rng)
    out_off = off.fused_eval_step(feats, mask, labels, weights, rng)
    _assert_same(out_on, out_off)


def test_assembled_eval_matches_reencode(feat_conf):
    conf = feat_conf.replace(B_seq=1, steps_per_dispatch=2)
    r = np.random.default_rng(11)
    N = 20
    rB = conf.B // conf.B_seq
    feats = r.normal(0, 1, (rB, conf.B_seq, N,
                            conf.n_chan_in)).astype(np.float32)
    mask = np.ones((rB, conf.B_seq, N), bool)
    labels = {"metastases": r.integers(0, 2, conf.B)}
    weights = np.ones(conf.B, np.float32)
    sel_rngs = jax.random.split(jax.random.PRNGKey(2), rB)

    on = IPSTrainer(conf.replace(eval_reuse_emb=True))
    off = IPSTrainer(conf.replace(eval_reuse_emb=False))
    out_on = on.fused_assembled_eval_step(feats, mask, labels, weights,
                                          sel_rngs)
    out_off = off.fused_assembled_eval_step(feats, mask, labels, weights,
                                            sel_rngs)
    _assert_same(out_on, out_off)


def test_streaming_select_returns_buffer_emb(tiny_conf):
    """Streamed emb == the eval-mode encode of the selected patches."""
    conf = tiny_conf.replace(eager=False)
    trainer = IPSTrainer(conf)
    patches, mask, _, _ = _image_batch(conf)
    rng = jax.random.PRNGKey(4)

    mem_patch, pos_a, idx_a, mask_a = trainer.select_streaming(
        patches, mask, rng)
    none_patch, pos_b, idx_b, mask_b, emb = trainer.select_streaming(
        patches, mask, rng, return_emb=True)
    assert none_patch is None
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    from ips_tpu.models.ips_net import IPSModel
    reenc = trainer.model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        mem_patch, train=False, method=IPSModel.encode)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(reenc),
                               rtol=0, atol=1e-6)


def test_streaming_eval_from_emb_matches_eval_step(tiny_conf):
    conf = tiny_conf.replace(eager=False)
    trainer = IPSTrainer(conf)
    patches, mask, labels, weights = _image_batch(conf)
    rng = jax.random.PRNGKey(9)

    mem_patch, pos, _, mmask = trainer.select_streaming(patches, mask, rng)
    out_off = trainer.eval_step(mem_patch, pos, mmask, labels, weights)
    _, pos2, _, mmask2, emb = trainer.select_streaming(
        patches, mask, rng, return_emb=True)
    out_on = trainer.eval_from_emb_step(emb, pos2, mmask2, labels, weights)
    _assert_same(out_on, out_off)


def test_streaming_shortcut_returns_full_emb(tiny_conf):
    """M >= N shortcut: return_emb encodes all N (what eval would do)."""
    conf = tiny_conf.replace(eager=False, M=tiny_conf.N)
    trainer = IPSTrainer(conf)
    patches, mask, _, _ = _image_batch(conf)
    _, _, idx, _, emb = trainer.select_streaming(
        patches, mask, jax.random.PRNGKey(0), return_emb=True)
    assert emb.shape[:2] == (conf.B, conf.N)
    from ips_tpu.models.ips_net import IPSModel
    reenc = trainer.model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        jnp.asarray(patches), train=False, method=IPSModel.encode)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(reenc),
                               rtol=0, atol=1e-6)


def test_int8_select_keeps_reencode(tiny_conf):
    """select_dtype=int8 quantizes the buffer: reuse must stay off."""
    conf = tiny_conf.replace(select_dtype="int8")
    trainer = IPSTrainer(conf)
    assert not trainer._reuse_eval_emb()


def test_infer_predictor_matches(tiny_conf, tmp_path):
    conf = tiny_conf
    patches, mask, _, _ = _image_batch(conf)
    from ips_tpu.infer import Predictor
    trainer = IPSTrainer(conf)
    pred_on = Predictor(conf.replace(eval_reuse_emb=True), trainer=trainer)
    pred_off = Predictor(conf.replace(eval_reuse_emb=False), trainer=trainer)
    out_on = pred_on.predict(patches, mask)
    out_off = pred_off.predict(patches, mask)
    np.testing.assert_array_equal(out_on["selected_idx"],
                                  out_off["selected_idx"])
    for t in conf.task_list:
        np.testing.assert_allclose(out_on[t.name], out_off[t.name],
                                   rtol=0, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(4, 2)])
def test_fused_eval_matches_under_mesh(tiny_conf, mesh_shape):
    """Reuse == re-encode under a dp x cp mesh (CP merge embeddings)."""
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    d, p = mesh_shape
    conf = tiny_conf.replace(mesh_data=d, mesh_patch=p, M=2, I=2)
    patches, mask, labels, weights = _image_batch(conf)
    rng = jax.random.PRNGKey(13)

    on = ShardedIPSTrainer(conf.replace(eval_reuse_emb=True))
    off = ShardedIPSTrainer(conf.replace(eval_reuse_emb=False))
    put = on.put_batch({"p": patches, "m": mask}, patch_dim=1)
    out_on = on.fused_eval_step(put["p"], put["m"], labels, weights, rng)
    put2 = off.put_batch({"p": patches, "m": mask}, patch_dim=1)
    out_off = off.fused_eval_step(put2["p"], put2["m"], labels, weights, rng)
    _assert_same(out_on, out_off)
