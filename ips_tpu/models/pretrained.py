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

from typing import Dict

import numpy as np

from ips_tpu.models.encoders import _STAGE_BLOCKS

_STAGE_WIDTHS = (64, 128, 256, 512)


def torchvision_manifest(enc_type: str = "resnet18"
                         ) -> Dict[str, tuple]:
    """Exact key -> shape schema of a FULL torchvision ResNet state dict.

    Derived from the standard architecture (the one the reference
    truncates, reference architecture/ips_net.py:17-52), so a real
    downloaded ``ResNet18_Weights.IMAGENET1K_V1``/``ResNet50`` checkpoint
    can be validated for complete coverage without torchvision installed.
    Includes the keys the converter intentionally ignores (``fc.*`` —
    dropped by the reference's truncation — and BatchNorm
    ``num_batches_tracked`` counters, which have no flax analog).
    """
    blocks = _STAGE_BLOCKS[enc_type]
    bottleneck = enc_type == "resnet50"
    exp = 4 if bottleneck else 1
    man: Dict[str, tuple] = {"conv1.weight": (64, 3, 7, 7)}

    def bn(name, c):
        man[f"{name}.weight"] = (c,)
        man[f"{name}.bias"] = (c,)
        man[f"{name}.running_mean"] = (c,)
        man[f"{name}.running_var"] = (c,)
        man[f"{name}.num_batches_tracked"] = ()

    bn("bn1", 64)
    c_in = 64
    for stage, (w, n_blocks) in enumerate(zip(_STAGE_WIDTHS, blocks), 1):
        for b in range(n_blocks):
            pre = f"layer{stage}.{b}"
            out = w * exp
            if bottleneck:
                man[f"{pre}.conv1.weight"] = (w, c_in, 1, 1)
                bn(f"{pre}.bn1", w)
                man[f"{pre}.conv2.weight"] = (w, w, 3, 3)
                bn(f"{pre}.bn2", w)
                man[f"{pre}.conv3.weight"] = (out, w, 1, 1)
                bn(f"{pre}.bn3", out)
            else:
                man[f"{pre}.conv1.weight"] = (w, c_in, 3, 3)
                bn(f"{pre}.bn1", w)
                man[f"{pre}.conv2.weight"] = (w, w, 3, 3)
                bn(f"{pre}.bn2", w)
            if b == 0 and c_in != out:
                man[f"{pre}.downsample.0.weight"] = (out, c_in, 1, 1)
                bn(f"{pre}.downsample.1", out)
            c_in = out
    man["fc.weight"] = (1000, 512 * exp)
    man["fc.bias"] = (1000,)
    return man


def verify_torchvision_state_dict(state_dict, enc_type: str = "resnet18",
                                  allow_missing: bool = False) -> None:
    """Check a state dict against the full torchvision key+shape schema.

    Raises ValueError listing every missing key (unless
    ``allow_missing``, for deliberately truncated checkpoints), every
    unexpected key, and every shape mismatch — loud and complete, so a
    wrong/renamed checkpoint fails at conversion, not as silently-kept
    random init at train time.
    """
    man = torchvision_manifest(enc_type)
    shapes = {k: tuple(getattr(v, "shape", ())) for k, v in
              state_dict.items()}
    problems = []
    if not allow_missing:
        missing = sorted(k for k in man if k not in shapes)
        if missing:
            problems.append(f"missing {len(missing)} keys: "
                            + ", ".join(missing[:8])
                            + ("..." if len(missing) > 8 else ""))
    unexpected = sorted(k for k in shapes if k not in man)
    if unexpected:
        problems.append(f"unexpected {len(unexpected)} keys: "
                        + ", ".join(unexpected[:8])
                        + ("..." if len(unexpected) > 8 else ""))
    bad = [f"{k}: checkpoint {shapes[k]} vs torchvision {man[k]}"
           for k in sorted(shapes) if k in man and shapes[k] != man[k]]
    if bad:
        problems.append("shape mismatches: " + "; ".join(bad[:8])
                        + ("..." if len(bad) > 8 else ""))
    if problems:
        raise ValueError(
            f"state dict does not match the torchvision {enc_type} "
            "schema — " + " | ".join(problems))


def torch_resnet_to_flat(state_dict, enc_type: str = "resnet18",
                         verify: str = "truncated"
                         ) -> Dict[str, np.ndarray]:
    """torchvision ResNet state dict -> flat {our_name: array} npz payload.

    Conv kernels transpose OIHW -> HWIO; BatchNorm maps to
    scale/bias (params) + mean/var (batch_stats).

    ``verify``: 'full' checks the complete torchvision schema (a real
    downloaded checkpoint must convert without code changes — every key
    present, none unexpected, all shapes right); 'truncated' allows
    missing keys but still rejects unknown keys and wrong shapes;
    'none' disables validation.
    """
    if verify not in ("full", "truncated", "none"):
        raise ValueError(f"verify must be full|truncated|none, got {verify}")
    if verify != "none":
        verify_torchvision_state_dict(state_dict, enc_type,
                                      allow_missing=verify == "truncated")
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
                # truncated checkpoint: the WHOLE block must be absent —
                # a half-present block converting silently would train
                # from half-random init
                leftover = [k for k in state_dict if k.startswith(src + ".")]
                if leftover:
                    raise ValueError(
                        f"block {src} is partially present (e.g. "
                        f"{leftover[0]}) — refusing a half-converted block")
                continue
            try:
                for c in range(1, n_convs + 1):
                    put_conv(f"{src}.conv{c}", f"{dst}/conv{c}")
                    put_bn(f"{src}.bn{c}", f"{dst}/bn{c}")
            except KeyError as e:
                raise ValueError(
                    f"block {src} is partially present (missing {e}) — "
                    "refusing a half-converted block") from e
            if src + ".downsample.0.weight" in state_dict:
                put_conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                put_bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
    return out


def save_npz(path: str, flat: Dict[str, np.ndarray]) -> None:
    np.savez(path, **flat)


def load_encoder_npz(path: str, variables, prefix: str = "",
                     on_mismatch: str = "raise", skip_keys=(),
                     expect_cover: bool = False):
    """Merge a converted npz into flax encoder variables.

    `variables`: {'params': ..., 'batch_stats': ...} of ConvPatchEncoder
    (or of IPSModel — pass prefix='encoder/'). Keys absent from the npz
    (e.g. truncated stages) keep their initialization.

    ``skip_keys``: npz-style keys (e.g. ``params/conv1/kernel``)
    *deliberately* kept at initialization — the reference swaps in a
    fresh 1-channel stem AFTER loading ImageNet weights (reference
    ips_net.py:27-31), so the stem kernel is the one legitimate skip.
    Any other shape mismatch raises (``on_mismatch='skip'`` downgrades
    all of them to silent skips; prefer skip_keys).

    ``expect_cover``: require every encoder variable under ``prefix``
    (both collections, minus skip_keys) to have been loaded from the
    npz — a partially matching checkpoint fails loudly instead of
    training from half-random init.
    """
    import flax

    if on_mismatch not in ("raise", "skip"):
        raise ValueError(f"on_mismatch must be raise|skip, got {on_mismatch}")
    skip_keys = set(skip_keys)
    flat_npz = dict(np.load(path))
    var_flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables), sep="/")
    updated = dict(var_flat)
    loaded = set()
    skipped = set()
    for key, val in flat_npz.items():
        col, _, rest = key.partition("/")
        target = f"{col}/{prefix}{rest}"
        if target not in var_flat:
            continue
        if key in skip_keys:
            skipped.add(target)
            continue
        if var_flat[target].shape != val.shape:
            if on_mismatch == "skip":
                continue
            raise ValueError(
                f"shape mismatch for {target}: checkpoint "
                f"{val.shape} vs model {var_flat[target].shape}"
                " (if this reinit is intentional, list the key in "
                "skip_keys)")
        updated[target] = val.astype(var_flat[target].dtype)
        loaded.add(target)
    if not loaded:
        raise ValueError(f"no keys from {path} matched the model")
    if expect_cover:
        # every variable under <collection>/<prefix> must be accounted for
        want = {k for k in var_flat
                if k.partition("/")[2].startswith(prefix)}
        uncovered = sorted(want - loaded - skipped)
        if uncovered:
            raise ValueError(
                f"{len(uncovered)} encoder variables not covered by "
                f"{path}: " + ", ".join(uncovered[:8])
                + ("..." if len(uncovered) > 8 else ""))
    return flax.core.freeze(
        flax.traverse_util.unflatten_dict(updated, sep="/"))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Convert a torchvision ResNet checkpoint to npz")
    p.add_argument("--enc_type", default="resnet18",
                   choices=["resnet18", "resnet50"])
    p.add_argument("--schema", default="full",
                   choices=["full", "truncated", "none"],
                   help="checkpoint validation: 'full' requires the exact "
                        "torchvision key+shape schema (default; a real "
                        "ImageNet checkpoint must pass), 'truncated' "
                        "allows missing stages, 'none' skips validation")
    p.add_argument("torch_ckpt", help=".pth state dict (local file)")
    p.add_argument("out_npz")
    a = p.parse_args(argv)
    import torch
    sd = torch.load(a.torch_ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    flat = torch_resnet_to_flat(sd, a.enc_type, verify=a.schema)
    save_npz(a.out_npz, flat)
    print(f"wrote {len(flat)} arrays to {a.out_npz}")


if __name__ == "__main__":
    main()
