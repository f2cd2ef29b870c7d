"""Traffic head-to-head: the ACTUAL reference implementation (torch, CPU)
vs ips_tpu on the identical synthetic STS corpus (VERDICT round-4 item 2).

The last parity surface with no run-for-run comparison: 3-channel RGB
input, ImageNet normalization placement, ColorJitter/RandomAffine
semantics, the visibility filter, no pos-enc, single task (reference
data/traffic/traffic_dataset.py:252-348). The corpus uses the round-5
weak-signal contrast knob (per-image sign contrast ~ U(0.15, 0.9)) so
test accuracy plateaus below 1.0 — replacing the saturated acc-1.00
round-2 evidence with a real curve.

torchvision is not installed here; the reference needs `models.resnet18`
(weights=None — pretrained=false override, no egress) and five transforms
(Resize/ColorJitter/RandomAffine(degrees=0)/ToTensor/Normalize). The
stubs implement the public torchvision semantics faithfully: ColorJitter
applies the four ops in a torch-RNG-random order with U(1-a, 1+a) blend
factors (hue: exact HSV rotation by U(-a, a)); RandomAffine with
degrees=0 reduces to an integer-rounded translation with zero fill —
the same semantics ips_tpu's numpy re-implementations mirror
(ips_tpu/data/traffic.py color_jitter/random_translate). The download
gate (`ensure_dataset_exists`, traffic_dataset.py:35-97) is stubbed to a
no-op: the synthetic corpus is already on disk and there is no egress.
No reference code is modified or copied.

Both sides run the reference traffic STRUCTURE (N=192, M=10, I=32,
resnet18, ColorJitter 0.1x4 + 100 px translate + visibility filter) at a
quarter of the pixel cost: 600x800 resize with 50x50 patches instead of
1200x1600 with 100x100 — same patch grid (12x16=192), same per-patch
sign fraction, same selection loop shape. The full-res torch arm costs
~944 s/epoch TRAIN ALONE on this 1-CPU box (measured,
results/ref_h2h_traffic_torch_calib.jsonl) and eval is nearly as
expensive as train in IPS (selection dominates), so a complete 12-epoch
full-res schedule is ~6 h — unrunnable in a round. At quarter cost a
complete 12-epoch cosine schedule fits (~55 min measured: 145 s train +
~120 s eval per epoch). The torch arm keeps
the reference's own translate semantics (RandomAffine fraction
100/IMG_SIZE == 100 px at any resolution — the harness sets the
TrafficSigns.IMG_SIZE class constant to (600, 800), configuration of a
hardcoded constant, no code modified); the ips arm matches it with the
max_shift=100 config override (ips otherwise SCALES the shift with
img_size). Additional CPU-budget overrides: n_res_blocks=2 (the 4-block
encoder doubles per-image cost), pretrained=false, B=8.

Usage (1-CPU box: phases sequentially, never two at once):
    python scripts/ref_headtohead_traffic.py --generate
    python scripts/ref_headtohead_traffic.py --run-reference [--seed k]
    python scripts/ref_headtohead_traffic.py --run-ours

Outputs: results/ref_h2h_traffic_{torch,ips}.jsonl (one line per
epoch+split).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

H2H_DIR = "data/h2h_traffic"

OVERRIDES = dict(
    data_dir=H2H_DIR, n_epoch=12, n_epoch_warmup=2, B=8, B_seq=8,
    n_worker=0, pin_memory=False, pretrained=False, n_res_blocks=2,
    # the reference has NO projection between encoder and transformer —
    # a 2-block resnet18 ends at layer2 (128 ch), so the transformer
    # must run at D=128; scale D_k/D_v/D_inner the way the reference's
    # own 2-block config does (mnist_config.yml:42-46)
    D=128, D_k=16, D_v=16, D_inner=512,
    # quarter-cost spec: 600x800 resize, 50x50 patches -> the SAME
    # 12x16=192 patch grid as the reference's 1200x1600/100x100
    patch_size=[50, 50], patch_stride=[50, 50],
)
# ips-arm-only overrides (unknown to the reference Struct's consumers,
# but harmless there; listed separately for clarity)
IPS_OVERRIDES = dict(img_size=[600, 800], max_shift=100)
REF_IMG_SIZE = (600, 800)  # patched onto TrafficSigns.IMG_SIZE
# 192 images/set -> 48/class; stored 600x800 (both pipelines resize to
# their native 1200x1600, where the reference's hardcoded 100 px
# translate and ips_tpu's scaled max_shift agree exactly)
GEN = dict(n_per_set=192, height=600, width=800, seed=0,
           contrast=0.9, contrast_min=0.15)


def generate():
    sys.path.insert(0, ".")
    from ips_tpu.data.traffic_synth import generate_synth_sts
    generate_synth_sts(H2H_DIR, **GEN)
    print(f"wrote {H2H_DIR} ({GEN['n_per_set']}/set, weak-signal contrast "
          f"U({GEN['contrast_min']}, {GEN['contrast']}))")


# ---------------------------------------------------------------------------
# torchvision stubs: resnet18 (shared with the image h2h) + the five
# transforms the reference traffic pipeline composes.
# ---------------------------------------------------------------------------

def _build_transform_stubs():
    import numpy as np
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size):
            self.h, self.w = size

        def __call__(self, img):
            return img.resize((self.w, self.h), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(3, 1, 1)
            self.std = torch.tensor(std).view(3, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    _GRAY = np.array([0.2989, 0.587, 0.114], np.float32)

    def _adjust_hue(img, factor):
        # exact RGB<->HSV rotation (torchvision F.adjust_hue semantics)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        maxc, minc = img.max(-1), img.min(-1)
        cr = maxc - minc
        ones = np.ones_like(maxc)
        s = cr / np.where(maxc == 0, ones, maxc)
        crd = np.where(cr == 0, ones, cr)
        rc, gc, bc = [(maxc - x) / crd for x in (r, g, b)]
        h = np.where(r == maxc, bc - gc,
                     np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
        h = ((h / 6.0) % 1.0 + factor) % 1.0
        i = np.floor(h * 6.0)
        f = h * 6.0 - i
        v = maxc
        p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
        i = i.astype(np.int32) % 6
        return np.stack([np.choose(i, [v, q, p, p, t, v]),
                         np.choose(i, [t, v, v, q, p, p]),
                         np.choose(i, [p, p, t, v, v, q])],
                        axis=-1).astype(np.float32)

    class ColorJitter:
        """torchvision semantics: the 4 ops in a random order, one factor
        each, factors drawn from the torch RNG (seeded by the driver)."""

        def __init__(self, brightness, contrast, saturation, hue):
            self.a = (brightness, contrast, saturation, hue)

        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            order = torch.randperm(4).tolist()
            ab, ac, asat, ah = self.a
            fb = float(torch.empty(1).uniform_(max(0, 1 - ab), 1 + ab))
            fc = float(torch.empty(1).uniform_(max(0, 1 - ac), 1 + ac))
            fs = float(torch.empty(1).uniform_(max(0, 1 - asat), 1 + asat))
            fh = float(torch.empty(1).uniform_(-ah, ah))

            def blend(x, other, f):
                return np.clip(f * x + (1 - f) * other, 0, 1)

            for op in order:
                if op == 0:
                    arr = blend(arr, np.zeros((), np.float32), fb)
                elif op == 1:
                    gm = (arr @ _GRAY).mean(dtype=np.float32)
                    arr = blend(arr, gm, fc)
                elif op == 2:
                    arr = blend(arr, (arr @ _GRAY)[..., None], fs)
                else:
                    arr = _adjust_hue(arr, fh)
            return Image.fromarray((arr * 255).round().astype(np.uint8))

    class RandomAffine:
        """degrees=0 + translate -> integer-rounded shift, zero fill."""

        def __init__(self, degrees, translate):
            assert degrees == 0, "stub supports degrees=0 only"
            self.translate = translate

        def __call__(self, img):
            W, H = img.size
            max_dx, max_dy = self.translate[0] * W, self.translate[1] * H
            dx = int(round(float(torch.empty(1).uniform_(-max_dx, max_dx))))
            dy = int(round(float(torch.empty(1).uniform_(-max_dy, max_dy))))
            arr = np.asarray(img)
            out = np.zeros_like(arr)
            h, w = H - abs(dy), W - abs(dx)
            sy, sx = max(0, -dy), max(0, -dx)
            ty, tx = max(0, dy), max(0, dx)
            out[ty:ty + h, tx:tx + w] = arr[sy:sy + h, sx:sx + w]
            return Image.fromarray(out)

    return dict(Compose=Compose, Resize=Resize, ToTensor=ToTensor,
                Normalize=Normalize, ColorJitter=ColorJitter,
                RandomAffine=RandomAffine)


def _install_stubs():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_headtohead_image import _build_torchvision_stub

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    r18, r50, w18, w50 = _build_torchvision_stub()
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", resnet18=r18, resnet50=r50,
                      ResNet18_Weights=w18, ResNet50_Weights=w50)
    tv.transforms = _stub("torchvision.transforms",
                          **_build_transform_stubs())

    class _Unused:
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed dependency used")

        def __getattr__(self, _):
            raise RuntimeError("stubbed dependency used")

    _stub("openslide", OpenSlide=_Unused, ImageSlide=_Unused)
    pr = _stub("progress")
    pr.bar = _stub("progress.bar", IncrementalBar=_Unused)
    sk = _stub("skimage")
    sk.draw = _stub("skimage.draw", polygon=_Unused)
    sk.measure = _stub("skimage.measure", label=_Unused)


def run_reference(seed=None, n_epoch=None):
    import numpy as np
    import torch
    import yaml
    from torch import nn
    from torch.utils.data import DataLoader

    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from utils.utils import Logger, Struct                            # noqa
    import data.traffic.traffic_dataset as tds                        # noqa
    from architecture.ips_net import IPSNet                           # noqa
    from training.iterative import train_one_epoch, evaluate          # noqa

    # The synthetic corpus is on disk; there is no egress. Skip the
    # md5-or-download gate (traffic_dataset.py:35-97) — everything
    # downstream (parsing, filtering, transforms) runs unmodified.
    tds.ensure_dataset_exists = lambda *a, **k: None
    # Quarter-cost resolution: IMG_SIZE is a hardcoded class constant
    # (traffic_dataset.py:265); setting it is configuration, not a code
    # change — every transform (Resize target, the translate fraction
    # 100/IMG_SIZE -> still 100 px) follows from the reference's own
    # formulas at the new size.
    tds.TrafficSigns.IMG_SIZE = REF_IMG_SIZE

    with open("/root/reference/config/traffic_config.yml") as f:
        c = yaml.load(f, Loader=yaml.FullLoader)
    c.update(OVERRIDES)
    if seed is not None:
        c["seed"] = seed
    if n_epoch is not None:
        c["n_epoch"] = n_epoch
    conf = Struct(**c)
    out_path = ("results/ref_h2h_traffic_torch.jsonl" if seed is None
                else f"results/ref_h2h_traffic_torch_seed{seed}.jsonl")

    device = torch.device("cpu")
    torch.manual_seed(conf.seed)
    np.random.seed(conf.seed)

    train_data = tds.TrafficSigns(conf, train=True)
    test_data = tds.TrafficSigns(conf, train=False)
    print(f"train {len(train_data)} / test {len(test_data)} images",
          flush=True)
    train_loader = DataLoader(train_data, batch_size=conf.B_seq,
                              shuffle=True, num_workers=0, pin_memory=False)
    test_loader = DataLoader(test_data, batch_size=conf.B_seq,
                             shuffle=False, num_workers=0, pin_memory=False)

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


def run_ours(device="cpu"):
    # --device tpu: run the ips arm on chip with exact fp32 MXU passes
    # (jax_default_matmul_precision='highest') — the 1-CPU box's serial
    # lane is booked by the torch arm; caveat documented in RESULTS.md.
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
    os.makedirs("results", exist_ok=True)
    mpath = "results/ref_h2h_traffic_ips.jsonl"
    if os.path.exists(mpath):
        os.remove(mpath)
    overrides = [f"{k}={v}" for k, v in
                 list(OVERRIDES.items()) + list(IPS_OVERRIDES.items())
                 if k not in ("n_worker", "pin_memory")]
    overrides += ["n_worker=0", "pin_memory=false",
                  "steps_per_dispatch=1", "input_dtype=float32",
                  "compute_dtype=float32", "input_norm=none",
                  f"metrics_path={mpath}"]
    conf = load_config("config/traffic_config.yml", overrides)
    run(conf, "traffic")
    print(f"wrote {mpath}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generate", action="store_true")
    p.add_argument("--run-reference", action="store_true")
    p.add_argument("--run-ours", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--n_epoch", type=int, default=None,
                   help="override epochs (timing probes)")
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                   help="ips arm device (tpu = highest-precision fp32)")
    a = p.parse_args()
    if a.generate:
        generate()
    if a.run_reference:
        run_reference(seed=a.seed, n_epoch=a.n_epoch)
    if a.run_ours:
        run_ours(a.device)
    if not (a.generate or a.run_reference or a.run_ours):
        p.print_help()


if __name__ == "__main__":
    main()
