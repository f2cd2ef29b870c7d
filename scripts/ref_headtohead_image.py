"""Image-mode head-to-head: the ACTUAL reference implementation (torch,
CPU) vs ips_tpu on the identical megapixel-MNIST corpus.

The round-3 head-to-head (`scripts/ref_headtohead.py`) covered feature
mode only. This one exercises the parts SURVEY.md ranks as the hard
parity problems — the truncated conv encoder with BN eval-during-
selection / train-during-forward (reference architecture/
ips_net.py:17-52,190-193), sin/cos positional encoding gathered by
original index (ips_net.py:233-238), the tie-break shuffle
(utils/utils.py:33-58), and the 4-task softmax+sigmoid loss/metric stack
(training/iterative.py:65-100) — run-for-run against the reference's own
code on a CPU-sized corpus (750x750 images, N=225 patches of 50x50,
M=I=25, resnet18 2-block, all 4 MNIST tasks).

torchvision is not installed in this environment; the reference's
`get_conv_patch_enc` only needs `torchvision.models.resnet18` with
`weights=None` (mnist config sets pretrained:false), so this harness
registers a faithful torch implementation of the standard ResNet-18
architecture (He et al. 2016; same module names conv1/bn1/layer1..4/
avgpool and same kaiming-fan-out init torchvision uses) as a stand-in.
No reference code is modified or copied.

Usage (1-CPU box: run phases sequentially, never two at once):
    python scripts/ref_headtohead_image.py --generate       # corpus
    python scripts/ref_headtohead_image.py --run-reference  # torch
    python scripts/ref_headtohead_image.py --run-ours       # ips_tpu CPU

Outputs: results/ref_h2h_image_torch.jsonl and
results/ref_h2h_image_ips.jsonl (one line per epoch+split with the four
task losses + metrics), stdout in each framework's own print format.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

H2H_DIR = "data/h2h_mnist"
H2H_MID_DIR = "data/h2h_mnist_mid"

# CPU-sized but structurally faithful: N=225 so selection runs a real
# 8-chunk scan (n_iter = ceil((225-25)/25)), all 4 tasks, shuffle +
# pos-enc on (the reference mnist defaults). B=8 gives 16 optimizer
# steps/epoch on the 128-image corpus; 60 epochs (960 steps) is enough
# for the conv encoder to lift all four tasks well off chance on CPU.
OVERRIDES = dict(
    data_dir=H2H_DIR, n_epoch=60, n_epoch_warmup=5, B=8, B_seq=8,
    n_worker=0, pin_memory=False, N=225, M=25, I=25,
)
GEN = dict(n_train=128, n_test=64, width=750, height=750, n_noise=12,
           seed=0)

# --scale mid (VERDICT round-4 next-item 1): a corpus big enough that
# TEST metrics are signal, not seed noise — the round-4 128-image corpus
# drove both frameworks into deep overfit (train acc 0.95+, test ~0.3).
# 640 train / 512 test keeps the same per-image shape (N=225, 50x50
# patches — the measured 0.35 s/image torch cost on this 1-CPU box) so
# one torch seed is ~2.5 h; the VERDICT's sketched 2k@1000x1000/N=400
# would be ~12 h/seed here, unrunnable twice within a round. 512 test
# images put the binomial std of a test accuracy near 0.8 at ~1.8%.
MID_OVERRIDES = dict(
    data_dir=H2H_MID_DIR, n_epoch=24, n_epoch_warmup=3, B=8, B_seq=8,
    n_worker=0, pin_memory=False, N=225, M=25, I=25,
)
MID_GEN = dict(n_train=640, n_test=512, width=750, height=750, n_noise=12,
               seed=0)


SCALE = "small"  # set by main(); selects corpus + output filenames


def _setup():
    if SCALE == "mid":
        return MID_OVERRIDES, MID_GEN, H2H_MID_DIR, "_mid"
    return OVERRIDES, GEN, H2H_DIR, ""


def generate():
    sys.path.insert(0, ".")
    overrides, gen, h2h_dir, _ = _setup()
    from ips_tpu.data.mnist import generate_megapixel_mnist
    generate_megapixel_mnist(
        h2h_dir, n_train=gen["n_train"], n_test=gen["n_test"],
        width=gen["width"], height=gen["height"], noise=True,
        n_noise=gen["n_noise"], seed=gen["seed"], digit_source="sklearn")
    print(f"wrote {h2h_dir} ({gen['n_train']} train / {gen['n_test']} test, "
          f"{gen['width']}x{gen['height']})")


# ---------------------------------------------------------------------------
# torchvision stand-in: standard ResNet-18/50 (He et al. 2016), module
# names and init matching torchvision so the reference's child-picking
# (conv1/bn1/relu/maxpool/layer1/layer2[/3/4]/avgpool) works unchanged.
# ---------------------------------------------------------------------------

def _build_torchvision_stub():
    import torch
    from torch import nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, c_in, c_out, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, c_in, c_out, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.conv3 = nn.Conv2d(c_out, c_out * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(c_out * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers):
            super().__init__()
            self.c_in = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0], 1)
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, 1000)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.ones_(m.weight)
                    nn.init.zeros_(m.bias)

        def _make_layer(self, block, c_out, n_blocks, stride):
            downsample = None
            if stride != 1 or self.c_in != c_out * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.c_in, c_out * block.expansion, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(c_out * block.expansion))
            blocks = [block(self.c_in, c_out, stride, downsample)]
            self.c_in = c_out * block.expansion
            blocks += [block(self.c_in, c_out) for _ in range(n_blocks - 1)]
            return nn.Sequential(*blocks)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet18(weights=None):
        assert weights is None, "stand-in supports weights=None only"
        return ResNet(BasicBlock, [2, 2, 2, 2])

    def resnet50(weights=None):
        assert weights is None, "stand-in supports weights=None only"
        return ResNet(Bottleneck, [3, 4, 6, 3])

    class _NoWeights:
        def __getattr__(self, _):
            raise RuntimeError("pretrained weights unavailable (no egress)")

    return resnet18, resnet50, _NoWeights(), _NoWeights()


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    class _Unused:
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed dependency used")

        def __getattr__(self, _):
            raise RuntimeError("stubbed dependency used")

    r18, r50, w18, w50 = _build_torchvision_stub()
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", resnet18=r18, resnet50=r50,
                      ResNet18_Weights=w18, ResNet50_Weights=w50)
    tv.transforms = _stub("torchvision.transforms", Compose=_Unused,
                          ToTensor=_Unused, Normalize=_Unused)
    _stub("openslide", OpenSlide=_Unused, ImageSlide=_Unused)
    pr = _stub("progress")
    pr.bar = _stub("progress.bar", IncrementalBar=_Unused)
    sk = _stub("skimage")
    sk.draw = _stub("skimage.draw", polygon=_Unused)
    sk.measure = _stub("skimage.measure", label=_Unused)


def run_reference(seed=None):
    import numpy as np
    import torch
    import yaml
    from torch import nn
    from torch.utils.data import DataLoader

    _install_stubs()
    overrides, _, _, sfx = _setup()
    sys.path.insert(0, "/root/reference")
    from utils.utils import Logger, Struct                            # noqa
    from data.megapixel_mnist.mnist_dataset import MegapixelMNIST     # noqa
    from architecture.ips_net import IPSNet                           # noqa
    from training.iterative import train_one_epoch, evaluate          # noqa

    with open("/root/reference/config/mnist_config.yml") as f:
        c = yaml.load(f, Loader=yaml.FullLoader)
    c.update(overrides)
    if seed is not None:
        # Seed-variance control: same corpus, different torch init/
        # shuffle stream, separate output file — quantifies how much of
        # any torch-vs-ips test gap is plain seed noise.
        c["seed"] = seed
    conf = Struct(**c)
    out_path = (f"results/ref_h2h_image{sfx}_torch.jsonl" if seed is None
                else f"results/ref_h2h_image{sfx}_torch_seed{seed}.jsonl")

    device = torch.device("cpu")
    torch.manual_seed(conf.seed)
    np.random.seed(conf.seed)

    train_data = MegapixelMNIST(conf, train=True)
    test_data = MegapixelMNIST(conf, train=False)
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
    out = open(out_path, "w")
    tasks = [(t["name"], t["metric"]) for t in conf.tasks.values()]
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
            rec = {"epoch": epoch, "split": split}
            for name, metric in tasks:
                rec[f"{name}_loss"] = float(lg.losses_epoch[name][epoch])
                rec[f"{name}_{metric}"] = float(lg.metrics[name][epoch])
            if split == "train":
                rec["train_seconds"] = round(t_train, 2)
            out.write(json.dumps(rec) + "\n")
        out.flush()
        sys.stdout.flush()
    out.close()
    print(f"wrote {out_path}")


def run_ours(device="cpu", seed=None):
    # Default: pin to CPU before any jax device use (the image's
    # sitecustomize registers the remote TPU backend in every process)
    # so both arms are plain fp32 CPU. --device tpu moves the ips arm to
    # the chip with jax_default_matmul_precision='highest' (exact fp32
    # MXU passes, not the default bf16x3) — used for the mid-scale run
    # where the 1-CPU box's serial lane is fully booked by the torch
    # arms; the numerics caveat is documented in RESULTS.md.
    import jax
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, ".")
    from ips_tpu.config import load_config
    from ips_tpu.main import run

    if device != "cpu":
        from ips_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    ov, _, _, sfx = _setup()
    os.makedirs("results", exist_ok=True)
    # --seed k: ips-side seed-variance control, mirroring the torch-side
    # one — same corpus, different init/shuffle/dropout stream.
    mpath = (f"results/ref_h2h_image{sfx}_ips.jsonl" if seed is None
             else f"results/ref_h2h_image{sfx}_ips_seed{seed}.jsonl")
    if os.path.exists(mpath):
        os.remove(mpath)
    # Neutralize TPU-side perf knobs so the comparison is the plain fp32
    # path on both sides.
    overrides = [f"{k}={v}" for k, v in ov.items()
                 if k not in ("n_worker", "pin_memory")]
    overrides += ["n_worker=0", "pin_memory=false", "sparse_input=false",
                  "steps_per_dispatch=1", "input_dtype=float32",
                  "compute_dtype=float32", f"metrics_path={mpath}"]
    if seed is not None:
        overrides += [f"seed={seed}"]
    conf = load_config("config/mnist_config.yml", overrides)
    run(conf, "mnist")
    print(f"wrote {mpath}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generate", action="store_true")
    p.add_argument("--run-reference", action="store_true")
    p.add_argument("--run-ours", action="store_true")
    p.add_argument("--seed", type=int, default=None,
                   help="seed override for either arm (seed-variance "
                        "control; applies to --run-reference / --run-ours)")
    p.add_argument("--scale", choices=["small", "mid"], default="small",
                   help="small = round-4 128-image corpus; mid = 640/512 "
                        "non-overfit corpus (VERDICT round-4 item 1)")
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                   help="ips arm device (tpu = highest-precision fp32)")
    a = p.parse_args()
    global SCALE
    SCALE = a.scale
    if a.generate:
        generate()
    if a.run_reference:
        run_reference(seed=a.seed)
    if a.run_ours:
        run_ours(a.device, seed=a.seed)
    if not (a.generate or a.run_reference or a.run_ours):
        p.print_help()


if __name__ == "__main__":
    main()
