"""Inference module: Predictor determinism + checkpoint round trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.infer import Predictor
from ips_tpu.train.steps import IPSTrainer


@pytest.fixture(scope="module")
def small_conf(tiny_conf):
    return tiny_conf.replace(B=2, B_seq=2, N=12, M=4, I=4,
                             donate_buffers=False)


def test_predictor_from_trainer_deterministic(small_conf):
    trainer = IPSTrainer(small_conf, rng=jax.random.PRNGKey(0))
    pred = Predictor(small_conf, trainer=trainer)
    patches = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                            (2, 12, 16, 16, 1)))
    out1 = pred.predict(patches)
    out2 = pred.predict(patches)
    np.testing.assert_array_equal(out1["selected_idx"],
                                  out2["selected_idx"])
    np.testing.assert_allclose(out1["majority"], out2["majority"],
                               rtol=1e-6)
    assert out1["majority"].shape == (2, small_conf.n_class)
    # softmax outputs sum to one
    np.testing.assert_allclose(out1["majority"].sum(-1), 1.0, rtol=1e-5)


def test_predictor_uses_trainer_weights(small_conf):
    t1 = IPSTrainer(small_conf, rng=jax.random.PRNGKey(0))
    t2 = IPSTrainer(small_conf, rng=jax.random.PRNGKey(42))
    patches = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                            (2, 12, 16, 16, 1)))
    p1 = Predictor(small_conf, trainer=t1).predict(patches)
    p2 = Predictor(small_conf, trainer=t2).predict(patches)
    assert not np.allclose(p1["majority"], p2["majority"])


def test_predictor_checkpoint_roundtrip(small_conf, tmp_path):
    from ips_tpu.utils.checkpoint import CheckpointManager
    trainer = IPSTrainer(small_conf, rng=jax.random.PRNGKey(7))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(trainer, 1)

    patches = np.asarray(jax.random.uniform(jax.random.PRNGKey(2),
                                            (2, 12, 16, 16, 1)))
    direct = Predictor(small_conf, trainer=trainer).predict(patches)
    loaded = Predictor(small_conf,
                       checkpoint_dir=str(tmp_path / "ck")).predict(patches)
    np.testing.assert_allclose(loaded["majority"], direct["majority"],
                               rtol=1e-5)
    np.testing.assert_array_equal(loaded["selected_idx"],
                                  direct["selected_idx"])


def test_predictor_missing_checkpoint(small_conf, tmp_path):
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        Predictor(small_conf, checkpoint_dir=str(tmp_path / "empty"))


def test_predictor_skips_optimizer_state(small_conf):
    pred = Predictor(small_conf)
    assert pred.trainer.state.opt_state is None
    with pytest.raises(RuntimeError, match="init_opt=False"):
        pred.trainer.train_step(None, None, None, {}, None,
                                jax.random.PRNGKey(0), 0.0)


def test_load_inputs_multisample_sources(small_conf, tmp_path):
    """A multi-sample .npy contributes one output row per sample, each
    attributed to 'file.npy[k]' (not misassigned to later paths)."""
    from ips_tpu.infer import _load_inputs
    rng = np.random.default_rng(0)
    np.save(tmp_path / "a.npy",
            rng.random((3, 12, 16, 16, 1)).astype(np.float32))
    np.save(tmp_path / "b.npy",
            rng.random((12, 16, 16, 1)).astype(np.float32))
    patches, sources = _load_inputs(
        small_conf, [str(tmp_path / "a.npy"), str(tmp_path / "b.npy")])
    assert patches.shape[0] == 4
    assert sources == ["a.npy[0]", "a.npy[1]", "a.npy[2]", "b.npy"]
