"""A/B training run: feature-projector ln_fold off vs on, same corpus/init.

The LN->GEMM fold (config.ln_fold, models/encoders.py) changes numerics
at bf16 rounding scale; fresh-params selection Jaccard on random features
measured 0.86 (results/r3b_probe.json). The question a user cares about
is END metrics: this trains the bucket-batched synthetic camelyon feature
task twice — identical HDF5 corpus, identical init/shuffle rngs, only
ln_fold differs — and records the per-epoch test AUC of both runs.

Run ON TPU:  python scripts/train_ln_fold_ab.py
Log: results/ln_fold_ab.log, JSON: results/ln_fold_ab.json
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_EPOCH = 20
FEAT_DIM = 128


def main():
    import tempfile

    from ips_tpu.config import config_from_dict
    from ips_tpu.data.camelyon.dataset import (CamelyonFeatures,
                                               make_synth_features)
    from ips_tpu.main import build_loaders
    from ips_tpu.train.loop import evaluate, train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer

    print(f"training on {jax.devices()[0]}", file=sys.stderr, flush=True)
    tmp = tempfile.mkdtemp(prefix="lnfold_")
    make_synth_features(f"{tmp}/train.h5", n_slides=48, feat_dim=FEAT_DIM,
                        n_range=(40, 140), seed=0, signal=2.0)
    make_synth_features(f"{tmp}/test.h5", n_slides=48, feat_dim=FEAT_DIM,
                        n_range=(40, 140), seed=1, signal=2.0)

    base = dict(
        n_epoch=N_EPOCH, B=4, B_seq=4, n_epoch_warmup=2, lr=1e-3, wd=0.1,
        n_class=1, is_image=False, n_chan_in=FEAT_DIM,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=0, M=16, I=16, use_pos=False, H=4, D=64, D_k=16, D_v=16,
        D_inner=256, attn_dropout=0.1, dropout=0.1, seed=0,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        steps_per_dispatch=2, data_dir=tmp, train_fname="train.h5",
        test_fname="test.h5",
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}})

    out = {}
    log_lines = []
    for fold in (False, True):
        tag = "fold" if fold else "exact"
        conf = config_from_dict(dict(base, ln_fold=fold))
        ds_train = CamelyonFeatures(conf, train=True)
        ds_test = CamelyonFeatures(conf, train=False)
        loader, test_loader = build_loaders(conf, ds_train, ds_test)
        trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(7))
        log = MetricsLogger(conf.task_list)
        aucs = []
        for epoch in range(N_EPOCH):
            train_one_epoch(trainer, loader, epoch, log, conf)
            log.compute_metric()
            evaluate(trainer, test_loader, log, conf)
            log.compute_metric()
            auc = float(log.metrics["metastases"][-1])
            loss = float(log.losses_epoch["metastases"][-1])
            aucs.append(auc)
            line = f"[{tag}] epoch {epoch + 1}: test auc {auc:.3f} loss {loss:.4f}"
            print(line, flush=True)
            log_lines.append(line)
        out[tag] = aucs

    out["final_delta"] = abs(out["fold"][-1] - out["exact"][-1])
    out["best_exact"] = max(out["exact"])
    out["best_fold"] = max(out["fold"])
    with open("results/ln_fold_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    with open("results/ln_fold_ab.log", "w") as f:
        f.write("\n".join(log_lines) + "\n")
    print(f"best exact {out['best_exact']:.3f} best fold "
          f"{out['best_fold']:.3f} final delta {out['final_delta']:.3f}")


if __name__ == "__main__":
    main()
