"""Worker for the 2-process END-TO-END multi-host training test (not a
test file). Runs the REAL CLI driver (`ips_tpu.main.run`) as one process
of a 2-process jax.distributed run: gloo CPU collectives, 2 virtual
devices per process, a 4-way data-parallel mesh spanning both processes,
process-sharded loaders, and full train+eval epochs.

Run as: python tests/multihost_worker.py <process_id> <port> <data_dir> <K>

The reference is single-process/single-GPU (reference main.py:19-20);
this exercises the SURVEY §2.3 distributed layer as a product path.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

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


def main():
    import os

    pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    steps_per_dispatch = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # optional checkpoint phase (preemption-recovery test): save in a first
    # 2-process run, resume in a second one with fresh processes
    ckpt_dir = os.environ.get("MH_CKPT_DIR", "")
    resume = os.environ.get("MH_RESUME", "") == "1"
    n_epoch = int(os.environ.get("MH_NEPOCH", "2"))
    sparse = os.environ.get("MH_SPARSE", "") == "1"
    # B_seq < B routes through the multi-host assembled path (the
    # reference's default camelyon shape, camelyon_config.yml:4-5)
    b_seq = int(os.environ.get("MH_BSEQ", "8"))

    from ips_tpu.config import config_from_dict
    from ips_tpu.main import run

    conf = config_from_dict(dict(
        multihost=True, coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid, cpu_collectives="gloo",
        n_epoch=n_epoch, B=8, B_seq=b_seq, n_epoch_warmup=1, lr=1e-3,
        wd=0.1,
        n_class=10, data_dir=data_dir, n_worker=0, eager=True,
        is_image=True, enc_type="resnet18", n_chan_in=1, n_res_blocks=2,
        shuffle=True, shuffle_style="batch", n_token=4,
        N=16, M=4, I=4, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=128,
        donate_buffers=False, steps_per_dispatch=steps_per_dispatch,
        checkpoint_dir=ckpt_dir, checkpoint_every=1 if ckpt_dir else 0,
        resume=resume, sparse_input=sparse, tasks=TASKS))

    trainer, log_train, log_test = run(conf, "mnist")

    assert jax.process_count() == 2, jax.process_count()
    from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
    assert isinstance(trainer, ShardedIPSTrainer), type(trainer)
    assert trainer.mesh.shape == {"data": 4, "patch": 1}, trainer.mesh.shape
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.is_fully_replicated, leaf.sharding

    # Fingerprint of the final params: a jitted global reduction every
    # process can read (replicated output).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    fp = jax.jit(
        lambda t: sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(t)),
        out_shardings=NamedSharding(trainer.mesh, P()))(trainer.state.params)

    n_logged = len(log_train.losses_epoch[log_train.tasks[0].name])
    losses = [
        float(np.mean([log_train.losses_epoch[t.name][e]
                       for t in log_train.tasks]))
        for e in range(n_logged)]
    test_metrics = log_test.latest()
    print("MH_OK " + json.dumps({
        "pid": pid, "fingerprint": float(fp), "losses": losses,
        "test_metrics": test_metrics}), flush=True)


if __name__ == "__main__":
    main()
