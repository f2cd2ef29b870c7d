"""TPU probe: inference (serving) throughput and latency of the Predictor.

The reference has no inference path at all (training prints metrics and
exits; SURVEY.md §5 'Checkpoint / resume'); ips_tpu adds one
(ips_tpu/infer.py: deterministic selection + eval forward in ONE jit).
This measures it at the two headline configurations, with in-jit
repetition (probe_train2.py methodology — standalone timing of small
jits bottoms out at the ~5 ms dispatch floor of the remote tunnel):

  * mnist flagship  (N=900 patches of 50x50x1, M=I=100): batch B=16 and
    single-image B=1 latency
  * camelyon features (N=10000 x 2048-dim, M=I=5000, projector+D=512):
    batch B=8 slides and B=1 slide latency

Run ON TPU:  python scripts/probe_infer.py
Results land in results/infer_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from scripts.probe_train2 import time_op  # noqa: E402  (enables jit cache)


def _mnist_rows(rows):
    import bench
    from ips_tpu.infer import Predictor

    conf = bench._conf("bfloat16", 16)
    pred = Predictor(conf)
    params = pred.trainer.state.params
    batch_stats = pred.trainer.state.batch_stats

    for B in (16, 1):
        patches = jax.random.uniform(
            jax.random.PRNGKey(0),
            (B, conf.N, *conf.patch_size, conf.n_chan_in), jnp.bfloat16)
        mask = jnp.ones((B, conf.N), bool)

        def fn(p):
            return pred._predict_impl(params, batch_stats, p, mask)

        sec = time_op(fn, patches)
        rows[f"mnist_B{B}"] = {
            "ms": sec * 1e3,
            "images_per_s": B / sec,
            "patches_per_s": B * conf.N / sec,
        }
        print(f"mnist_B{B}: {sec * 1e3:.2f} ms "
              f"({B / sec:.1f} img/s, {B * conf.N / sec / 1e3:.0f}k "
              f"patches/s)", flush=True)


def _camelyon_rows(rows):
    from ips_tpu.config import config_from_dict
    from ips_tpu.infer import Predictor

    conf = config_from_dict(dict(
        n_epoch=1, B=8, B_seq=1, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=2048,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=10000, M=5000, I=5000, use_pos=False,
        H=8, D=512, D_k=64, D_v=64, D_inner=2048,
        attn_dropout=0.1, dropout=0.1, compute_dtype="bfloat16",
        donate_buffers=False,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))
    pred = Predictor(conf)
    params = pred.trainer.state.params
    batch_stats = pred.trainer.state.batch_stats

    for B in (8, 1):
        feats = jax.random.normal(jax.random.PRNGKey(1),
                                  (B, conf.N, conf.n_chan_in), jnp.bfloat16)
        mask = jnp.ones((B, conf.N), bool)

        def fn(x):
            return pred._predict_impl(params, batch_stats, x, mask)

        sec = time_op(fn, feats)
        rows[f"camelyon_B{B}"] = {
            "ms": sec * 1e3,
            "slides_per_s": B / sec,
            "feature_patches_per_s": B * conf.N / sec,
        }
        print(f"camelyon_B{B}: {sec * 1e3:.2f} ms ({B / sec:.1f} slides/s)",
              flush=True)


def main():
    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rows = {}
    _mnist_rows(rows)
    _camelyon_rows(rows)
    with open("results/infer_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/infer_probe.json")


if __name__ == "__main__":
    main()
