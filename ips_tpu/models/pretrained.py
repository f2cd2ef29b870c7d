"""Pretrained encoder weights: torch-checkpoint conversion + npz loading.

The reference loads torchvision ImageNet weights into its truncated
ResNet (reference architecture/ips_net.py:20-27) and a BYOL ResNet-50
checkpoint in feature extraction (reference extract_feat.py:105-117).
This environment has no network egress, so the path here is: convert a
*local* torch checkpoint once to an ``.npz`` (host-side, torch-cpu), then
load it into the flax encoder anywhere.

    python -m ips_tpu.models.pretrained resnet18.pth weights.npz
    # training: set config `pretrained: true, pretrained_path: weights.npz`
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ips_tpu.models.encoders import _STAGE_BLOCKS


def torch_resnet_to_flat(state_dict, enc_type: str = "resnet18"
                         ) -> Dict[str, np.ndarray]:
    """torchvision ResNet state dict -> flat {our_name: array} npz payload.

    Conv kernels transpose OIHW -> HWIO; BatchNorm maps to
    scale/bias (params) + mean/var (batch_stats).
    """
    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    out: Dict[str, np.ndarray] = {}

    def put_conv(src: str, dst: str):
        w = np_(state_dict[src + ".weight"])
        out[f"params/{dst}/kernel"] = w.transpose(2, 3, 1, 0)

    def put_bn(src: str, dst: str):
        out[f"params/{dst}/scale"] = np_(state_dict[src + ".weight"])
        out[f"params/{dst}/bias"] = np_(state_dict[src + ".bias"])
        out[f"batch_stats/{dst}/mean"] = np_(state_dict[src + ".running_mean"])
        out[f"batch_stats/{dst}/var"] = np_(state_dict[src + ".running_var"])

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")
    blocks = _STAGE_BLOCKS[enc_type]
    n_convs = 3 if enc_type == "resnet50" else 2
    for stage in range(4):
        for b in range(blocks[stage]):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_block{b}"
            if src + ".conv1.weight" not in state_dict:
                continue  # allow truncated checkpoints
            for c in range(1, n_convs + 1):
                put_conv(f"{src}.conv{c}", f"{dst}/conv{c}")
                put_bn(f"{src}.bn{c}", f"{dst}/bn{c}")
            if src + ".downsample.0.weight" in state_dict:
                put_conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                put_bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
    return out


def save_npz(path: str, flat: Dict[str, np.ndarray]) -> None:
    np.savez(path, **flat)


def load_encoder_npz(path: str, variables, prefix: str = "",
                     on_mismatch: str = "raise"):
    """Merge a converted npz into flax encoder variables.

    `variables`: {'params': ..., 'batch_stats': ...} of ConvPatchEncoder
    (or of IPSModel — pass prefix='encoder/'). Keys absent from the npz
    (e.g. truncated stages) keep their initialization. Shape mismatches
    raise by default; ``on_mismatch='skip'`` keeps the initialization
    instead — the reference's behavior for a re-shaped 1-channel stem,
    which it swaps in *after* loading ImageNet weights
    (reference ips_net.py:27-31).
    """
    import flax

    if on_mismatch not in ("raise", "skip"):
        raise ValueError(f"on_mismatch must be raise|skip, got {on_mismatch}")
    flat_npz = dict(np.load(path))
    var_flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables), sep="/")
    updated = dict(var_flat)
    n_loaded = 0
    for key, val in flat_npz.items():
        col, _, rest = key.partition("/")
        target = f"{col}/{prefix}{rest}"
        if target in var_flat:
            if var_flat[target].shape != val.shape:
                if on_mismatch == "skip":
                    continue
                raise ValueError(
                    f"shape mismatch for {target}: checkpoint "
                    f"{val.shape} vs model {var_flat[target].shape}")
            updated[target] = val.astype(var_flat[target].dtype)
            n_loaded += 1
    if n_loaded == 0:
        raise ValueError(f"no keys from {path} matched the model")
    return flax.core.freeze(
        flax.traverse_util.unflatten_dict(updated, sep="/"))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Convert a torchvision ResNet checkpoint to npz")
    p.add_argument("--enc_type", default="resnet18",
                   choices=["resnet18", "resnet50"])
    p.add_argument("torch_ckpt", help=".pth state dict (local file)")
    p.add_argument("out_npz")
    a = p.parse_args(argv)
    import torch
    sd = torch.load(a.torch_ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    flat = torch_resnet_to_flat(sd, a.enc_type)
    save_npz(a.out_npz, flat)
    print(f"wrote {len(flat)} arrays to {a.out_npz}")


if __name__ == "__main__":
    main()
