"""TPU probe: steps_per_dispatch sweep at camelyon reference scale.

After the round-3 gather fixes + ln_fold, the camelyon fused feature step
is 15.5 ms device but 19.4 ms wall at K=4 (results/r3b_probe.json) —
~3.9 ms/step of per-dispatch residual left on the table. On MNIST the
same residual amortized with K=32; here one stacked input batch is
(16, 10k, 2048) bf16 = 640 MB, so K is HBM-bounded: K=8 stacks 5.1 GB.
This sweeps K in {4, 8} (ln_fold=True, the shipped camelyon config) with
K DISTINCT batches and reports wall ms/step; OOM at a K is recorded, not
fatal.

Run ON TPU:  python scripts/probe_camelyon_k.py
Results land in results/camelyon_k_sweep.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, N, M, I, D_FEAT = 16, 10_000, 5_000, 5_000, 2048


def timeit(fn, n_warmup=2, n_iter=2):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def make_conf(**over):
    from ips_tpu.config import config_from_dict
    base = dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1, ln_fold=True,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}})
    base.update(over)
    return config_from_dict(base)


def main():
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    labels = {"metastases": jnp.zeros((B, 1), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)
    lr = 3e-4

    trainer = IPSTrainer(make_conf(), rng=jax.random.PRNGKey(1))
    rows = {}
    for K in (4, 6, 8):
        try:
            # one-op construction: K distinct batches without K transient
            # (B, N, D) intermediates (a list-comprehension stack doubles
            # peak HBM during construction, which OOMs before the step)
            scale = (1.0 + 0.001 * jnp.arange(K, dtype=jnp.float32)
                     )[:, None, None, None].astype(jnp.bfloat16)
            feats_k = feats[None] * scale
            mask_k = jnp.ones((K, B, N), bool)
            labels_k = {k: jnp.broadcast_to(v, (K,) + v.shape)
                        for k, v in labels.items()}
            weights_k = jnp.broadcast_to(weights, (K,) + weights.shape)
            rngs = jax.random.split(rng, K)
            lrs = jnp.full((K,), lr, jnp.float32)

            def multi():
                losses, _, _ = trainer.fused_multi_step(
                    feats_k, mask_k, labels_k, weights_k, rngs, lrs)
                return losses

            ms = timeit(multi) * 1e3 / K
            rows[f"multi_k{K}_ms"] = ms
            print(f"K={K}: {ms:.2f} ms/step", flush=True)
            del feats_k
        except Exception as e:  # noqa: BLE001 - record OOM, keep sweeping
            rows[f"multi_k{K}_error"] = repr(e)[:300]
            print(f"K={K} failed: {e}", file=sys.stderr, flush=True)

    with open("results/camelyon_k_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/camelyon_k_sweep.json")


if __name__ == "__main__":
    main()
