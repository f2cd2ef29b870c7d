"""Training driver CLI.

Reference parity (reference main.py:1-78) with upgrades: the dataset is a
CLI flag instead of a source edit (reference main.py:22), any config key
can be overridden on the command line, and checkpoint/resume is available
(the reference has none — SURVEY.md §5).

Usage:
    python -m ips_tpu.main --dataset mnist
    python -m ips_tpu.main --config config/mnist_config.yml B=8 n_epoch=5
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ips_tpu.config import Config, load_config
from ips_tpu.train.loop import evaluate, train_one_epoch
from ips_tpu.train.metrics import MetricsLogger
from ips_tpu.train.steps import IPSTrainer
from ips_tpu.utils.profiling import EfficiencyTracker


def build_datasets(conf: Config, dataset: str):
    if dataset == "mnist":
        from ips_tpu.data.mnist import MegapixelMNIST
        return (MegapixelMNIST(conf, train=True),
                MegapixelMNIST(conf, train=False))
    if dataset == "traffic":
        from ips_tpu.data.traffic import TrafficSigns
        return (TrafficSigns(conf, train=True),
                TrafficSigns(conf, train=False))
    if dataset == "camelyon":
        from ips_tpu.data.camelyon.dataset import CamelyonFeatures
        return (CamelyonFeatures(conf, train=True),
                CamelyonFeatures(conf, train=False))
    if dataset == "camelyon_e2e":
        from ips_tpu.data.camelyon.patches import CamelyonPatches
        return (CamelyonPatches(conf, train=True),
                CamelyonPatches(conf, train=False))
    raise ValueError(f"unknown dataset {dataset!r}")


def build_loaders(conf: Config, train_data, test_data):
    from ips_tpu.data.loader import DataLoader

    # Multi-host: every process draws the same seeded batch order but loads
    # only its slice of each global batch; the sharded trainer's
    # put_batch/put_assembled assemble the global arrays. For B_seq < B
    # (the reference's default camelyon shape) the loader runs at
    # OPTIMIZER-batch granularity (batch_size=B): each process's B/P
    # contiguous rows are exactly its r/P loader-slots of B_seq rows
    # (loop._prep_assembled_mh).
    pi, pc = jax.process_index(), jax.process_count()
    mh_assembled = (pc > 1 and conf.eager and not conf.sparse_input
                    and conf.B_seq < conf.B)
    batch_size = conf.B if mh_assembled else conf.B_seq

    def bucket_fn(data):
        # Variable-N datasets batch > 1 rows by grouping same-bucket
        # slides (reference is locked to B_seq=1, camelyon_config.yml:4-5).
        # Multi-host assembled batches ALWAYS bucket when the dataset can:
        # the global (r, B_seq, N, ...) payload needs one shape per
        # optimizer batch.
        if (conf.B_seq > 1 or mh_assembled) and hasattr(data, "bucket_of"):
            return data.bucket_of
        return None

    train_loader = DataLoader(train_data, batch_size=batch_size,
                              shuffle=True, num_workers=conf.n_worker,
                              seed=conf.seed,
                              bucket_fn=bucket_fn(train_data),
                              process_index=pi, process_count=pc)
    test_loader = DataLoader(test_data, batch_size=batch_size, shuffle=False,
                             num_workers=conf.n_worker,
                             bucket_fn=bucket_fn(test_data),
                             process_index=pi, process_count=pc)
    return train_loader, test_loader


def build_trainer(conf: Config):
    """Single-device IPSTrainer, or ShardedIPSTrainer when the config
    asks for a device mesh (mesh_data x mesh_patch > 1) — the multi-chip
    replacement for the reference's single-GPU pin (reference
    main.py:19-20). Multi-process runs always get the sharded trainer
    over a mesh spanning every host's devices (defaulting the data axis
    to all devices when the config leaves the mesh at 1x1)."""
    rng = jax.random.PRNGKey(conf.seed)
    if jax.process_count() > 1 and conf.mesh_data * conf.mesh_patch == 1:
        conf = conf.replace(mesh_data=len(jax.devices()) // conf.mesh_patch)
    if conf.mesh_data * conf.mesh_patch > 1:
        from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
        return ShardedIPSTrainer(conf, rng=rng)
    return IPSTrainer(conf, rng=rng)


def _check_multihost_path(conf: Config):
    """Multi-host supports every eager path: dense fused (B_seq == B, any
    steps_per_dispatch), sparse fused (B_seq == B, any steps_per_dispatch),
    and the assembled B_seq < B shape — the reference's default camelyon
    schedule (reference config/camelyon_config.yml:4-5) — when the r =
    B/B_seq loader-slot axis divides over processes and the data mesh
    axis. The streaming (lazy) path keeps host-side selection state that
    is not globalized. Fail loud up front instead of mid-epoch."""
    from ips_tpu.train.loop import _use_pipeline
    if jax.process_count() == 1:
        return
    if _use_pipeline(conf):
        return
    if conf.sparse_input and conf.eager and conf.B_seq == conf.B:
        return
    if conf.eager and not conf.sparse_input and conf.B_seq < conf.B:
        n_data = (conf.mesh_data if conf.mesh_data * conf.mesh_patch > 1
                  else len(jax.devices()) // conf.mesh_patch)
        r = conf.B // conf.B_seq
        if r % n_data == 0:
            return
        raise ValueError(
            f"multi-host assembled path (B_seq < B) needs r = B/B_seq "
            f"divisible by the data mesh axis — got r={r}, "
            f"data={n_data}; raise B or lower B_seq/mesh size")
    raise ValueError(
        "multi-host training requires an eager path: dense fused "
        "(B_seq == B), sparse fused (B_seq == B), or assembled "
        "(B_seq < B, sparse_input=false) — got "
        f"eager={conf.eager}, B_seq={conf.B_seq}, B={conf.B}, "
        f"sparse_input={conf.sparse_input}, "
        f"steps_per_dispatch={conf.steps_per_dispatch}")


def run(conf: Config, dataset: str):
    # Must precede every other jax call in the process (multi-host
    # coordination cannot start once the backend is touched).
    from ips_tpu.parallel.distributed import initialize_from_config
    initialize_from_config(conf)
    _check_multihost_path(conf)
    main_process = jax.process_index() == 0

    np.random.seed(conf.seed)
    if main_process:
        print("Used config:")
        print(conf.pretty(), flush=True)

    train_data, test_data = build_datasets(conf, dataset)
    train_loader, test_loader = build_loaders(conf, train_data, test_data)

    trainer = build_trainer(conf)

    ckpt_mgr = None
    start_epoch = 0
    last_saved = -1
    if conf.checkpoint_dir:
        from ips_tpu.utils.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(conf.checkpoint_dir)
        if conf.resume:
            start_epoch = ckpt_mgr.restore(trainer) or 0
            if start_epoch:
                # Realign the shuffle/augmentation streams so the
                # resumed schedule is sample-order-identical to an
                # unbroken run (Loader.skip_epochs docstring).
                train_loader.skip_epochs(start_epoch)

    log_train = MetricsLogger(conf.task_list)
    log_test = MetricsLogger(conf.task_list)
    tracker = EfficiencyTracker(conf)

    for epoch in range(start_epoch, conf.n_epoch):
        # Optional XLA-level trace of the first epoch
        # (jax.profiler -> TensorBoard/Perfetto; SURVEY.md §5 tracing).
        profiling = conf.profile_dir and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(conf.profile_dir)
        t_epoch = time.perf_counter()
        lr = train_one_epoch(trainer, train_loader, epoch, log_train, conf,
                             tracker)
        t_epoch = time.perf_counter() - t_epoch
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {conf.profile_dir}",
                  flush=True)
        log_train.compute_metric()
        if main_process:
            # every process accumulates the same GLOBAL metrics under
            # multi-host; only one needs to report them
            log_train.print_stats(epoch, train=True, lr=lr)
            print(f"epoch wall: {t_epoch:.2f}s", flush=True)
            if conf.metrics_path:
                log_train.write_jsonl(conf.metrics_path, epoch, "train",
                                      lr=lr,
                                      train_seconds=round(t_epoch, 2))

        evaluate(trainer, test_loader, log_test, conf)
        log_test.compute_metric()
        if main_process:
            log_test.print_stats(epoch, train=False)
            if conf.metrics_path:
                log_test.write_jsonl(conf.metrics_path, epoch, "test")

        if ckpt_mgr and conf.checkpoint_every and \
                (epoch + 1) % conf.checkpoint_every == 0:
            ckpt_mgr.save(trainer, epoch + 1)
            last_saved = epoch + 1

    if ckpt_mgr and last_saved != conf.n_epoch and start_epoch < conf.n_epoch:
        # start_epoch == n_epoch means a resumed, already-finished run:
        # the final checkpoint exists and orbax refuses to overwrite a step
        ckpt_mgr.save(trainer, conf.n_epoch)
    return trainer, log_train, log_test


def main(argv=None):
    p = argparse.ArgumentParser(description="ips_tpu training driver")
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "traffic", "camelyon", "camelyon_e2e"])
    p.add_argument("--config", default=None,
                   help="YAML config path (default: config/<dataset>_config.yml)")
    p.add_argument("overrides", nargs="*",
                   help="config overrides as key=value")
    a = p.parse_args(argv)
    cfg_path = a.config or os.path.join("config", f"{a.dataset}_config.yml")
    conf = load_config(cfg_path, a.overrides)
    run(conf, a.dataset)


if __name__ == "__main__":
    main()
