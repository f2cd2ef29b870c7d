"""End-to-end CLI training over the virtual CPU mesh.

The reference trains on exactly one pinned GPU (reference main.py:19-20);
here the same driver entry (`ips_tpu.main.run`) goes data/context-parallel
when the config sets mesh_data/mesh_patch — these tests run the REAL
driver path (datasets from disk, loader, trainer construction, epoch
loop) on the 8-device CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

from ips_tpu.config import config_from_dict
from ips_tpu.main import build_trainer, run

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow


TASKS = {
    "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
              "metric": "accuracy"},
    "task1": {"id": 1, "name": "max", "act_fn": "softmax",
              "metric": "accuracy"},
    "task2": {"id": 2, "name": "top", "act_fn": "softmax",
              "metric": "accuracy"},
    "task3": {"id": 3, "name": "multi", "act_fn": "sigmoid",
              "metric": "multilabel_accuracy"},
}


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    from ips_tpu.data.mnist import generate_megapixel_mnist
    d = tmp_path_factory.mktemp("mesh_mnist")
    generate_megapixel_mnist(str(d), n_train=16, n_test=8, width=200,
                             height=200, noise=True, n_noise=5, seed=0,
                             digit_source="synthetic")
    return str(d)


def _conf(mnist_dir, **mesh):
    return config_from_dict(dict(
        n_epoch=2, B=8, B_seq=8, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, data_dir=mnist_dir, n_worker=0, eager=True,
        is_image=True, enc_type="resnet18", n_chan_in=1, n_res_blocks=2,
        shuffle=True, shuffle_style="batch", n_token=4,
        N=16, M=4, I=4, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=128,
        donate_buffers=False, tasks=TASKS, **mesh))


def _mean_losses(logger):
    """Per-epoch loss averaged over tasks from the MetricsLogger."""
    per_task = [logger.losses_epoch[t.name] for t in logger.tasks]
    return np.mean(np.asarray(per_task), axis=0)


@pytest.mark.parametrize("mesh_data,mesh_patch", [(8, 1), (4, 2)])
def test_cli_trains_on_mesh(mnist_dir, mesh_data, mesh_patch):
    conf = _conf(mnist_dir, mesh_data=mesh_data, mesh_patch=mesh_patch)
    trainer, log_train, log_test = run(conf, "mnist")

    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    assert isinstance(trainer, ShardedIPSTrainer)
    assert trainer.mesh.shape == {"data": mesh_data, "patch": mesh_patch}

    # Params stay replicated across the mesh after real updates.
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated

    losses = _mean_losses(log_train)
    assert len(losses) == conf.n_epoch
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


def test_cli_mesh_with_steps_per_dispatch(mnist_dir):
    """steps_per_dispatch>1 under a (4,2) mesh: the K-step scan runs with
    sharded batch inputs and replicated params."""
    conf = _conf(mnist_dir, mesh_data=4, mesh_patch=2).replace(
        steps_per_dispatch=2)
    trainer, log_train, _ = run(conf, "mnist")
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated
    losses = _mean_losses(log_train)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


def test_resume_after_completion_is_noop(mnist_dir, tmp_path):
    """Re-running a finished run with resume=True must exit cleanly, not
    crash re-saving the already-existing final orbax step."""
    conf = _conf(mnist_dir).replace(checkpoint_dir=str(tmp_path / "ck"))
    run(conf, "mnist")

    trainer, log_train, _ = run(conf.replace(resume=True), "mnist")
    # start_epoch == n_epoch: nothing trained, nothing re-saved
    assert all(len(v) == 0 for v in log_train.losses_epoch.values())


def test_build_trainer_selects_sharded(mnist_dir):
    conf = _conf(mnist_dir, mesh_data=1, mesh_patch=1)
    from ips_tpu.train.steps import IPSTrainer
    t = build_trainer(conf)
    assert type(t) is IPSTrainer


def test_mesh_rejects_indivisible_batch(mnist_dir):
    """B (the optimizer batch) must divide the data axis; B_seq need not
    (selection row-replicates, the assembled path shards loader-slots)."""
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    conf = _conf(mnist_dir, mesh_data=8, mesh_patch=1).replace(B=6, B_seq=6)
    with pytest.raises(ValueError, match="multiple of"):
        ShardedIPSTrainer(conf)


def test_mesh_rejects_cp_overflow(mnist_dir):
    # only the approximate local-merge mode has the per-shard M
    # constraint; exact CP (the default) runs the single global stream
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    conf = _conf(mnist_dir, mesh_data=2, mesh_patch=4).replace(
        cp_select="local_merge")  # N/cp=4 == M
    with pytest.raises(ValueError, match="M < N/mesh_patch"):
        ShardedIPSTrainer(conf)


def test_cli_mesh_assembled_bseq1(mnist_dir):
    """B_seq=1 — the reference's EXACT camelyon default
    (camelyon_config.yml:4-5) — on a 4-way data mesh: previously a
    constructor error (B_seq cannot shard over rows); now selection
    row-replicates and the grouped assembled path shards the r = B
    loader-slot axis over `data` (_assembled_spec)."""
    conf = _conf(mnist_dir, mesh_data=4, mesh_patch=2).replace(
        B=8, B_seq=1, steps_per_dispatch=2, n_epoch=1)
    trainer, log_train, _ = run(conf, "mnist")
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated
    losses = _mean_losses(log_train)
    assert len(losses) == conf.n_epoch and np.isfinite(losses).all()


def test_cli_mesh_assembled_path(mnist_dir):
    """B_seq < B under the mesh: the round-3 assembled driver (vmapped
    selections + train in one dispatch, K per dispatch) must work with
    sharded batch stacking — jnp.stack of (data,patch)-sharded per-batch
    arrays feeds the rdatp in_shardings."""
    conf = _conf(mnist_dir, mesh_data=4, mesh_patch=2).replace(
        B=8, B_seq=4, steps_per_dispatch=2)
    trainer, log_train, log_test = run(conf, "mnist")
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated
    losses = _mean_losses(log_train)
    assert len(losses) == conf.n_epoch and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"
