"""Head-to-head: run the ACTUAL reference implementation (torch, CPU)
against ips_tpu on the identical synthetic CAMELYON feature corpus.

Until now the quality-parity claim rested on matching the reference's
metric *definitions*; this script trains the reference's own code
(`/root/reference`: IPSNet + train_one_epoch/evaluate + Logger, feature
mode, B_seq=1 assembly — reference main.py:35-78) on the same two HDF5
files our trainer reads, so the per-epoch test AUC trajectories are
directly comparable. The conv path needs torchvision (not installed);
feature mode does not, so unused imports (torchvision / openslide /
skimage) are satisfied with inert stubs — no reference code is modified
or copied.

Usage (CPU box; run phases separately to avoid racing on one core):
    python scripts/ref_headtohead.py --generate      # write the corpus
    python scripts/ref_headtohead.py --run-reference # torch reference
    # ours, same corpus (run via the normal CLI):
    #   PYTHONPATH= JAX_PLATFORMS=cpu python -m ips_tpu.main \
    #       --dataset camelyon data_dir=data/h2h train_fname=feat_train.hdf5 \
    #       test_fname=feat_test.hdf5 <same overrides, see OVERRIDES below> \
    #       metrics_path=results/ref_h2h_ips.jsonl

Outputs: results/ref_h2h_torch.jsonl (one line per epoch: split, loss,
auc, wall seconds) and stdout in the reference's own print format.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

H2H_DIR = "data/h2h"
TRAIN_F = "feat_train.hdf5"
TEST_F = "feat_test.hdf5"

# Small-but-nontrivial shape: slides of 40-200 patches, M=I=32 so
# selection runs a real multi-chunk scan; signal low enough that AUC
# does not saturate in epoch 1. Same values feed both frameworks.
OVERRIDES = dict(
    data_dir=H2H_DIR, train_fname=TRAIN_F, test_fname=TEST_F,
    n_epoch=20, n_epoch_warmup=3, B=8, B_seq=1, n_worker=0,
    pin_memory=False, M=32, I=32, n_chan_in=256,
    D=128, D_k=16, D_v=16, D_inner=512, H=8,
)
GEN = dict(n_train=96, n_test=64, feat_dim=256, signal=0.55, seed=0)


def generate():
    sys.path.insert(0, ".")
    from ips_tpu.data.camelyon.dataset import make_synth_features
    make_synth_features(os.path.join(H2H_DIR, TRAIN_F),
                        n_slides=GEN["n_train"], feat_dim=GEN["feat_dim"],
                        seed=GEN["seed"], signal=GEN["signal"])
    make_synth_features(os.path.join(H2H_DIR, TEST_F),
                        n_slides=GEN["n_test"], feat_dim=GEN["feat_dim"],
                        seed=GEN["seed"] + 1, signal=GEN["signal"])
    print(f"wrote {H2H_DIR}/{TRAIN_F} ({GEN['n_train']} slides), "
          f"{H2H_DIR}/{TEST_F} ({GEN['n_test']} slides)")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    """Inert stand-ins for deps the feature-mode path never calls."""
    class _Unused:  # noqa: D401 - raises if the stubbed dep is touched
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed dependency used by feature mode")

        def __getattr__(self, _):
            raise RuntimeError("stubbed dependency used by feature mode")

    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", resnet18=_Unused,
                      resnet50=_Unused, ResNet18_Weights=_Unused,
                      ResNet50_Weights=_Unused)
    tv.transforms = _stub("torchvision.transforms", Compose=_Unused,
                          ToTensor=_Unused, Normalize=_Unused)
    _stub("openslide", OpenSlide=_Unused, ImageSlide=_Unused)
    pr = _stub("progress")
    pr.bar = _stub("progress.bar", IncrementalBar=_Unused)
    sk = _stub("skimage")
    sk.draw = _stub("skimage.draw", polygon=_Unused)
    sk.measure = _stub("skimage.measure", label=_Unused)


def run_reference():
    import numpy as np
    import torch
    import yaml
    from torch import nn
    from torch.utils.data import DataLoader

    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from utils.utils import Logger, Struct                      # noqa: E402
    from data.camelyon.camelyon_dataset import CamelyonFeatures  # noqa: E402
    from architecture.ips_net import IPSNet                     # noqa: E402
    from training.iterative import train_one_epoch, evaluate    # noqa: E402

    with open("/root/reference/config/camelyon_config.yml") as f:
        c = yaml.load(f, Loader=yaml.FullLoader)
    c.update(OVERRIDES)
    conf = Struct(**c)

    device = torch.device("cpu")
    torch.manual_seed(conf.seed)
    np.random.seed(conf.seed)

    train_data = CamelyonFeatures(conf, train=True)
    test_data = CamelyonFeatures(conf, train=False)
    train_loader = DataLoader(train_data, batch_size=conf.B_seq, shuffle=True,
                              num_workers=0, pin_memory=False)
    test_loader = DataLoader(test_data, batch_size=conf.B_seq, shuffle=False,
                             num_workers=0, pin_memory=False)

    net = IPSNet(device, conf).to(device)
    optimizer = torch.optim.AdamW(net.parameters(), lr=0,
                                  weight_decay=conf.wd)
    criterions = {t["name"]: (nn.NLLLoss() if t["act_fn"] == "softmax"
                              else nn.BCELoss())
                  for t in conf.tasks.values()}
    log_train, log_test = Logger(conf.tasks), Logger(conf.tasks)

    os.makedirs("results", exist_ok=True)
    out = open("results/ref_h2h_torch.jsonl", "w")
    task = list(conf.tasks.values())[0]["name"]
    for epoch in range(conf.n_epoch):
        t0 = time.perf_counter()
        train_one_epoch(net, criterions, train_loader, optimizer, device,
                        epoch, log_train, conf)
        t_train = time.perf_counter() - t0
        log_train.compute_metric()
        log_train.print_stats(epoch, train=True,
                              lr=optimizer.param_groups[0]["lr"])
        evaluate(net, criterions, test_loader, device, log_test, conf)
        log_test.compute_metric()
        log_test.print_stats(epoch, train=False)
        for split, lg in (("train", log_train), ("test", log_test)):
            out.write(json.dumps({
                "epoch": epoch, "split": split,
                f"{task}_loss": float(lg.losses_epoch[task][epoch]),
                f"{task}_auc": float(lg.metrics[task][epoch]),
                **({"train_seconds": round(t_train, 2)}
                   if split == "train" else {}),
            }) + "\n")
        out.flush()
    out.close()
    print("wrote results/ref_h2h_torch.jsonl")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generate", action="store_true")
    p.add_argument("--run-reference", action="store_true")
    a = p.parse_args()
    if a.generate:
        generate()
    if a.run_reference:
        run_reference()
    if not (a.generate or a.run_reference):
        p.print_help()


if __name__ == "__main__":
    main()
