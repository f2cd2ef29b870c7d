"""Lazy (streaming) selection must match the fused scan engine exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.train.steps import IPSTrainer

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



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


def test_streaming_grouped_matches_ungrouped(tiny_conf):
    """stream_chunk_group=G scans G chunks per dispatch; the selection
    must be IDENTICAL to the per-chunk engine — params are constant
    within a selection and the scan body is the same step applied in the
    same chunk order. Covers no-tail (G divides), ragged-tail (mixed
    grouped + per-chunk), and G > n_chunks (pure fallback) schedules."""
    rng = jax.random.PRNGKey(3)
    patches = np.asarray(jax.random.uniform(rng, (2, 34, 16, 16, 1)))
    mask = np.ones((2, 34), bool)
    mask[1, 30:] = False
    base = tiny_conf.replace(N=34, M=4, I=5, eager=False)
    ref = IPSTrainer(base, rng=jax.random.PRNGKey(11))
    a = ref.select_streaming(patches, mask, rng)
    for g in (2, 4, 8):   # 6 chunks: 3 groups / 1 group + 2 tail / all tail
        tr = IPSTrainer(base.replace(stream_chunk_group=g),
                        rng=jax.random.PRNGKey(11))
        b = tr.select_streaming(patches, mask, rng)
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-6)


def test_streaming_grouped_train_loop(tiny_conf):
    """eager=False + stream_chunk_group drives the full train loop."""
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from tests.test_train_loop import SignalPatches

    conf = tiny_conf.replace(N=12, M=4, I=4, eager=False, B=4, B_seq=4,
                             n_class=10, stream_chunk_group=2)
    data = SignalPatches(conf, n_samples=8)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    trainer = IPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    assert len(log.losses_it["majority"]) == 2
    assert np.isfinite(log.losses_it["majority"]).all()


def test_streaming_cp_mesh_matches_single_device(tiny_conf):
    """Streaming under a (2,4) data x patch mesh: chunks shard over BOTH
    axes (each device encodes I/4 patches of every streamed chunk) and the
    selection must be IDENTICAL to the single-device stream — the patch
    axis sharding only parallelizes the encode; scoring sees the full
    candidate set (VERDICT r2 item 8 / missing #5)."""
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer

    conf = tiny_conf.replace(N=20, M=4, I=8, eager=False, B=4, B_seq=4,
                             mesh_data=2, mesh_patch=4)
    rng = jax.random.PRNGKey(7)
    patches = np.asarray(jax.random.uniform(rng, (4, 20, 16, 16, 1)))
    mask = np.ones((4, 20), bool)
    mask[0, 15:] = False

    single = IPSTrainer(conf.replace(mesh_data=1, mesh_patch=1),
                        rng=jax.random.PRNGKey(11))
    sharded = ShardedIPSTrainer(conf, rng=jax.random.PRNGKey(11))

    a = single.select_streaming(patches, mask, rng)
    b = sharded.select_streaming(patches, mask, rng)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)
    # the chunk sharding really spans the patch axis on the mesh
    s = sharded._stream_sharding(np.zeros((4, 8, 16, 16, 1), np.float32))
    assert s.spec == ("data", "patch", None, None, None) or \
        tuple(s.spec) == ("data", "patch", None, None, None)

    # grouped chunks under the same mesh: scan axis replicated, inner
    # dims sharded like a single chunk — and the selection still matches
    grouped = ShardedIPSTrainer(conf.replace(stream_chunk_group=2),
                                rng=jax.random.PRNGKey(11))
    c = grouped.select_streaming(patches, mask, rng)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(c[2]))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(c[3]))
    sg = grouped._stream_group_sharding(
        np.zeros((2, 4, 8, 16, 16, 1), np.float32))
    assert tuple(sg.spec) == (None, "data", "patch", None, None, None)


def test_streaming_cp_train_loop(tiny_conf):
    """Lazy mode + CP mesh end to end: one epoch through train_one_epoch
    with grouped (steps_per_dispatch) train updates disabled by design on
    the streaming path (selection is host-driven) — finite losses and
    replicated params after real updates."""
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from tests.test_train_loop import SignalPatches

    conf = tiny_conf.replace(N=20, M=4, I=4, eager=False, B=4, B_seq=4,
                             n_class=10, mesh_data=2, mesh_patch=4,
                             use_pos=True)
    data = SignalPatches(conf, n_samples=8)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=False)
    trainer = ShardedIPSTrainer(conf)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    log.compute_metric()
    assert np.isfinite(log.losses_epoch["majority"][0])
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated
