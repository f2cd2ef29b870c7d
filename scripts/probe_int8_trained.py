"""TPU probe: int8 selection fidelity at TRAINED params (VERDICT r2 weak #3).

Round-2 reported int8-vs-bf16 selection Jaccard only at fresh init
(0.778). A user flipping `select_dtype=int8` runs with trained weights —
this measures what they would actually get: restore the epoch-40 MNIST
checkpoint (ckpt_mnist40/), then over the FULL 1000-image test set

  * per-instance selection-set Jaccard(int8, bf16) with identical params
    and rng, and
  * end metrics (all 4 tasks) of a full eval epoch with int8 selection
    vs bf16 selection.

The training forward always re-encodes survivors in full precision, so
any metric delta comes purely from ranking disagreement.

Run ON TPU:  python scripts/probe_int8_trained.py
Results land in results/int8_trained_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from ips_tpu.config import load_config
    from ips_tpu.data.loader import DataLoader
    from ips_tpu.data.mnist import MegapixelMNIST
    from ips_tpu.train.loop import evaluate
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer
    from ips_tpu.utils.checkpoint import CheckpointManager

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = load_config("config/mnist_config.yml",
                       ["input_dtype=bfloat16", "n_worker=4"])
    trainer = IPSTrainer(conf)
    epoch = CheckpointManager("ckpt_mnist40").restore(trainer)
    print(f"restored checkpoint at epoch {epoch}", file=sys.stderr,
          flush=True)

    tr_int8 = IPSTrainer(conf.replace(select_dtype="int8"))
    tr_int8.state = trainer.state           # identical trained weights

    test = MegapixelMNIST(conf, train=False)
    out = {"epoch": epoch, "n_test": len(test)}

    # -- selection-set Jaccard over the whole test set ---------------------
    loader = DataLoader(test, batch_size=conf.B_seq, shuffle=False,
                        num_workers=conf.n_worker)
    jaccards = []
    rng0 = jax.random.PRNGKey(7)
    for it, batch in enumerate(loader):
        rng = jax.random.fold_in(rng0, it)
        if batch["input"].shape[0] != conf.B_seq:
            continue                         # ragged tail: skip for Jaccard
        patches = jax.device_put(
            jax.numpy.asarray(batch["input"]).astype(jax.numpy.bfloat16))
        mask = jax.numpy.ones(patches.shape[:2], bool)
        idx_a = jax.device_get(trainer._select(
            trainer.state.params, trainer.state.batch_stats, patches, mask,
            rng)[2])
        idx_b = jax.device_get(tr_int8._select(
            tr_int8.state.params, tr_int8.state.batch_stats, patches, mask,
            rng)[2])
        for a, b in zip(idx_a, idx_b):
            sa, sb = set(a.tolist()), set(b.tolist())
            jaccards.append(len(sa & sb) / len(sa | sb))
    out["jaccard_mean"] = float(np.mean(jaccards))
    out["jaccard_p10"] = float(np.percentile(jaccards, 10))
    out["jaccard_min"] = float(np.min(jaccards))
    print(f"trained-params selection Jaccard(int8, bf16): "
          f"mean {out['jaccard_mean']:.3f}  p10 {out['jaccard_p10']:.3f}  "
          f"min {out['jaccard_min']:.3f}", flush=True)

    # -- end metrics of a full eval epoch, int8 vs bf16 selection ----------
    for name, tr in (("bf16", trainer), ("int8", tr_int8)):
        logger = MetricsLogger(conf.task_list)
        ld = DataLoader(test, batch_size=conf.B_seq, shuffle=False,
                        num_workers=conf.n_worker)
        evaluate(tr, ld, logger, tr.conf)
        logger.compute_metric()
        out[f"metrics_{name}"] = logger.latest()
        print(f"{name} eval metrics: {out[f'metrics_{name}']}", flush=True)
    out["metric_delta"] = {
        k: out["metrics_int8"][k] - out["metrics_bf16"][k]
        for k in out["metrics_bf16"]}

    with open("results/int8_trained_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/int8_trained_probe.json")


if __name__ == "__main__":
    main()
