"""Inference: load a checkpoint, classify megapixel inputs.

The reference has no inference path (training prints metrics and exits;
SURVEY.md §5 'Checkpoint / resume'). This module adds one: a jitted
deterministic pipeline (selection without shuffle -> eval-mode forward)
plus a CLI for batch prediction over saved patch arrays or raw images.

    python -m ips_tpu.infer --config config/mnist_config.yml \
        --checkpoint ckpts/ --input images/*.png --output preds.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ips_tpu.config import Config, load_config
from ips_tpu.train.steps import IPSTrainer


class Predictor:
    """Deterministic IPS inference over one set of trained parameters."""

    def __init__(self, conf: Config, checkpoint_dir: Optional[str] = None,
                 trainer: Optional[IPSTrainer] = None):
        # Inference never shuffles (deterministic, reproducible selection);
        # init_opt=False skips the two param-sized AdamW moment trees.
        self.conf = conf.replace(shuffle=False, donate_buffers=False)
        self.trainer = IPSTrainer(self.conf, init_opt=False)
        if trainer is not None:
            # adopt the live trainer's weights; keep OUR deterministic conf
            # (the trainer's own jits may have shuffle enabled)
            self.trainer.state = trainer.state
        if checkpoint_dir:
            from ips_tpu.utils.checkpoint import CheckpointManager
            restored = CheckpointManager(checkpoint_dir).restore(self.trainer)
            if restored is None:
                raise FileNotFoundError(
                    f"no checkpoint found under {checkpoint_dir}")
        self._predict = jax.jit(self._predict_impl)

    def _predict_impl(self, params, batch_stats, patches, mask):
        tr = self.trainer
        if tr._reuse_eval_emb():
            # inference = eval mode: the selection buffer's embeddings ARE
            # what re-encoding the survivors would recompute (steps.py
            # _reuse_eval_emb) — skip the patch gather + encoder pass
            _, mem_pos, mem_idx, mem_mask, mem_emb = tr._select_impl(
                params, batch_stats, patches, mask, jax.random.PRNGKey(0),
                return_emb=True)
            variables = {"params": params, "batch_stats": batch_stats}
            from ips_tpu.models.ips_net import IPSModel
            attn_mask = mem_mask if self.conf.mask_padding else None
            emb = mem_emb if mem_pos is None else mem_emb + mem_pos
            image_emb = tr.model.apply(variables, emb, attn_mask, False,
                                       method=IPSModel.aggregate)
            preds = tr.model.apply(variables, image_emb,
                                   method=IPSModel.predict)
            return preds, mem_idx
        mem_patch, mem_pos, mem_idx, mem_mask = tr._select_impl(
            params, batch_stats, patches, mask, jax.random.PRNGKey(0))
        attn_mask = mem_mask if self.conf.mask_padding else None
        preds = tr.model.apply(
            {"params": params, "batch_stats": batch_stats},
            mem_patch, mem_pos, attn_mask, train=False)
        return preds, mem_idx

    def predict(self, patches: np.ndarray,
                mask: Optional[np.ndarray] = None
                ) -> Dict[str, np.ndarray]:
        """patches (B, N, ...) -> {task: probs} + 'selected_idx' (B, M)."""
        patches = jnp.asarray(patches)
        B, N = patches.shape[:2]
        m = (jnp.asarray(mask, bool) if mask is not None
             else jnp.ones((B, N), bool))
        preds, mem_idx = self._predict(self.trainer.state.params,
                                       self.trainer.state.batch_stats,
                                       patches, m)
        # one device->host latency window for the whole result tree
        # (per-leaf fetches are ~40 ms RPCs each on tunneled backends)
        from ips_tpu.train.loop import _fetch
        preds, mem_idx = _fetch((preds, mem_idx))
        out = {k: np.asarray(v) for k, v in preds.items()}
        out["selected_idx"] = np.asarray(mem_idx)
        return out


def _load_inputs(conf: Config, paths):
    """Image files or .npy patch arrays -> ((B, N, ph, pw, C), row_sources).

    row_sources has one label per batch row: a multi-sample .npy
    contributes several rows ("file.npy[k]"), so predictions stay
    attributed to their actual source.
    """
    from ips_tpu.data.patchify import patchify
    batches, sources = [], []
    for p in paths:
        name = os.path.basename(p)
        if p.endswith(".npy"):
            arr = np.load(p)
            if arr.ndim == 4:            # (N, ph, pw, C) single image
                arr = arr[None]
            batches.append(arr.astype(np.float32))
            sources.extend(name if arr.shape[0] == 1 else f"{name}[{k}]"
                           for k in range(arr.shape[0]))
        else:
            from PIL import Image
            img = np.asarray(Image.open(p).convert(
                "L" if conf.n_chan_in == 1 else "RGB"), np.float32) / 255.0
            if img.ndim == 2:
                img = img[..., None]
            batches.append(patchify(img, conf.patch_size,
                                    conf.patch_stride)[None])
            sources.append(name)
    return np.concatenate(batches, axis=0), sources


def main(argv=None):
    p = argparse.ArgumentParser(description="ips_tpu inference")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", nargs="+", required=True,
                   help="image files or .npy patch arrays (globs ok)")
    p.add_argument("--output", default="",
                   help="write predictions JSON here (default: stdout)")
    p.add_argument("overrides", nargs="*")
    a = p.parse_args(argv)

    conf = load_config(a.config, a.overrides)
    paths = sorted(sum((glob.glob(x) for x in a.input), []))
    if not paths:
        raise FileNotFoundError(f"no inputs matched {a.input}")
    patches, row_sources = _load_inputs(conf, paths)

    predictor = Predictor(conf, checkpoint_dir=a.checkpoint)
    preds = predictor.predict(patches)

    result = []
    for i, source in enumerate(row_sources):
        row = {"input": source}
        for task in conf.task_list:
            probs = preds[task.name][i]
            row[task.name] = {
                "probs": np.asarray(probs).round(5).tolist(),
                "pred": (int(np.argmax(probs))
                         if task.act_fn == "softmax"
                         else (np.asarray(probs) >= 0.5).astype(int).tolist()),
            }
        row["selected_patches"] = preds["selected_idx"][i].tolist()
        result.append(row)

    text = json.dumps(result, indent=2)
    if a.output:
        with open(a.output, "w") as f:
            f.write(text)
        print(f"wrote {a.output}")
    else:
        print(text)


if __name__ == "__main__":
    main()
