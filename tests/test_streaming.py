"""Lazy (streaming) selection must match the fused scan engine exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.train.steps import IPSTrainer


@pytest.fixture(scope="module")
def trainer(tiny_conf):
    conf = tiny_conf.replace(N=20, M=4, I=5, eager=False)
    return IPSTrainer(conf, rng=jax.random.PRNGKey(11))


def test_streaming_matches_scan(trainer):
    rng = jax.random.PRNGKey(3)
    patches = np.asarray(jax.random.uniform(rng, (2, 20, 16, 16, 1)))
    dev = trainer.select(jnp.asarray(patches), rng=rng)
    lazy = trainer.select_streaming(patches, rng=rng)
    np.testing.assert_array_equal(np.asarray(dev[2]), np.asarray(lazy[2]))
    np.testing.assert_allclose(np.asarray(dev[0]), np.asarray(lazy[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dev[1]), np.asarray(lazy[1]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev[3]), np.asarray(lazy[3]))


def test_streaming_with_mask(trainer):
    rng = jax.random.PRNGKey(4)
    patches = np.asarray(jax.random.uniform(rng, (2, 20, 16, 16, 1)))
    mask = np.ones((2, 20), bool)
    mask[0, 12:] = False
    dev = trainer.select(jnp.asarray(patches), jnp.asarray(mask), rng)
    lazy = trainer.select_streaming(patches, mask, rng)
    np.testing.assert_array_equal(np.asarray(dev[2]), np.asarray(lazy[2]))
    np.testing.assert_array_equal(np.asarray(dev[3]), np.asarray(lazy[3]))


def test_streaming_shortcut(trainer):
    rng = jax.random.PRNGKey(5)
    patches = np.asarray(jax.random.uniform(rng, (2, 3, 16, 16, 1)))
    mem_patch, mem_pos, mem_idx, mem_mask = trainer.select_streaming(
        patches, rng=rng)
    np.testing.assert_array_equal(np.asarray(mem_idx), [[0, 1, 2]] * 2)
    np.testing.assert_allclose(np.asarray(mem_patch), patches)


def test_streaming_in_train_loop(tiny_conf):
    """eager=False drives the full loop through the streaming path."""
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from tests.test_train_loop import SignalPatches

    conf = tiny_conf.replace(N=12, M=4, I=4, eager=False, B=4, B_seq=4,
                             n_class=10)
    data = SignalPatches(conf, n_samples=8)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    assert len(log.losses_it["majority"]) == 2


def test_streaming_bf16_matches_eager(tiny_conf):
    """Under input_dtype=bfloat16 the lazy path must ship bf16 chunks
    (half the host->HBM volume) and select identically to the eager
    engine (both cast to bf16 before the first conv)."""
    conf = tiny_conf.replace(N=20, M=4, I=5, eager=False,
                             input_dtype="bfloat16")
    tr = IPSTrainer(conf, rng=jax.random.PRNGKey(11))
    rng = jax.random.PRNGKey(3)
    patches = np.asarray(jax.random.uniform(rng, (2, 20, 16, 16, 1)))
    dev = tr.select(jnp.asarray(patches), rng=rng)
    lazy = tr.select_streaming(patches, rng=rng)
    assert lazy[0].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(dev[2]), np.asarray(lazy[2]))
    np.testing.assert_allclose(np.asarray(dev[0], np.float32),
                               np.asarray(lazy[0], np.float32), rtol=1e-6)


def test_bf16_input_dtype_select(tiny_conf):
    """input_dtype=bfloat16 runs the selection loop in bf16 storage."""
    conf = tiny_conf.replace(N=12, M=4, I=4, input_dtype="bfloat16")
    tr = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    patches = jax.random.uniform(rng, (2, 12, 16, 16, 1))
    mem_patch, mem_pos, mem_idx, mem_mask = tr.select(patches, rng=rng)
    assert mem_patch.dtype == jnp.bfloat16
    assert mem_patch.shape == (2, 4, 16, 16, 1)
    idx = np.asarray(mem_idx)
    assert (idx >= 0).all() and (idx < 12).all()
