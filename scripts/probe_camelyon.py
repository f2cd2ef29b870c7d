"""TPU probe: camelyon feature-mode optimizer-step schedules.

The reference locks camelyon to B_seq=1 (one slide per forward,
sequential assembly into the B=16 optimizer batch —
config/camelyon_config.yml:4-5), because torch cannot stack ragged
slides. Bucket-batched loading (DataLoader bucket_fn) lifts that: same-
bucket slides batch to B_seq=B, which turns 16 selection dispatches + 1
train dispatch per optimizer step into ONE fused dispatch (and K of
those into one multi-step dispatch).

This measures the three schedules at reference scale on resident data
(B=16 slides, N=10 000 feature patches each, M=I=5000, 2048->512
projector, D=512, bf16):

  * seq_b1   — 16x select(B=1) dispatches + assemble + train_step
               (the reference-shaped schedule)
  * fused    — one fused select+train dispatch (needs B_seq == B)
  * multi_k4 — 4 fused steps per dispatch (steps_per_dispatch=4)

Run ON TPU:  python scripts/probe_camelyon.py
Results land in results/camelyon_probe.json.
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
K = 4


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    mask = jnp.ones((B, N), bool)
    labels = {"metastases": jnp.zeros((B, 1), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)
    lr = 3e-4
    rows = {}

    # -- reference-shaped: B_seq=1 selects + assembled train --------------
    feats1 = [feats[i:i + 1] for i in range(B)]
    mask1 = mask[:1]

    def seq_step():
        mems = [trainer.select(feats1[i], mask1, rng) for i in range(B)]
        mem_patch = jnp.concatenate([m[0] for m in mems])
        mem_mask = jnp.concatenate([m[3] for m in mems])
        loss, _, _ = trainer.train_step(mem_patch, None, mem_mask, labels,
                                        weights, rng, lr)
        return loss

    rows["seq_b1_ms"] = timeit(seq_step, n_iter=3) * 1e3
    print(f"seq_b1 (16x select + train): {rows['seq_b1_ms']:.1f} "
          f"ms/optimizer step", flush=True)

    # -- assembled fused: the SAME B_seq=1 schedule, one dispatch ----------
    # (round 3: loop._train_epoch_assembled routes the reference's default
    # shape here — vmapped selections + train in one jit, identical update
    # sequence to seq_b1)
    feats_r = feats.reshape(B, 1, N, D_FEAT)
    mask_r = mask.reshape(B, 1, N)
    sel_rngs = jax.random.split(rng, B)

    def assembled():
        loss, _, _ = trainer.fused_assembled_step(
            feats_r, mask_r, labels, weights, sel_rngs, rng, lr)
        return loss

    rows["assembled_ms"] = timeit(assembled, n_iter=3) * 1e3
    print(f"assembled (B_seq=1, one dispatch): {rows['assembled_ms']:.1f} "
          f"ms/optimizer step", flush=True)

    # -- K=4 assembled steps per dispatch (the gated product route) --------
    feats_kr = jnp.broadcast_to(feats_r, (K,) + feats_r.shape)
    mask_kr = jnp.broadcast_to(mask_r, (K,) + mask_r.shape)
    labels_k4 = {k: jnp.broadcast_to(v, (K,) + v.shape)
                 for k, v in labels.items()}
    weights_k4 = jnp.broadcast_to(weights, (K,) + weights.shape)
    sel_rngs_k = jax.random.split(rng, K * B).reshape(K, B, -1)

    def assembled_multi():
        losses, _, _ = trainer.fused_assembled_multi_step(
            feats_kr, mask_kr, labels_k4, weights_k4, sel_rngs_k,
            jax.random.split(rng, K), jnp.full((K,), lr, jnp.float32))
        return losses

    rows["assembled_multi_k4_ms"] = timeit(assembled_multi, n_iter=2) * 1e3 / K
    print(f"assembled multi_k4: {rows['assembled_multi_k4_ms']:.1f} "
          f"ms/optimizer step", flush=True)

    # -- fused single dispatch (bucket-batched B_seq == B) ----------------
    def fused():
        loss, _, _ = trainer.fused_step(feats, mask, labels, weights, rng,
                                        lr)
        return loss

    rows["fused_ms"] = timeit(fused) * 1e3
    print(f"fused (one dispatch): {rows['fused_ms']:.1f} ms/optimizer step",
          flush=True)

    # -- K steps per dispatch ---------------------------------------------
    feats_k = jnp.broadcast_to(feats, (K,) + feats.shape)
    mask_k = jnp.broadcast_to(mask, (K,) + mask.shape)
    labels_k = {k: jnp.broadcast_to(v, (K,) + v.shape)
                for k, v in labels.items()}
    weights_k = jnp.broadcast_to(weights, (K,) + weights.shape)
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), lr, jnp.float32)

    def multi():
        losses, _, _ = trainer.fused_multi_step(feats_k, mask_k, labels_k,
                                                weights_k, rngs, lrs)
        return losses

    rows["multi_k4_ms"] = timeit(multi, n_iter=2) * 1e3 / K
    print(f"multi_k4: {rows['multi_k4_ms']:.1f} ms/optimizer step",
          flush=True)
    rows["speedup_fused_vs_seq"] = rows["seq_b1_ms"] / rows["fused_ms"]
    rows["speedup_multi_vs_seq"] = rows["seq_b1_ms"] / rows["multi_k4_ms"]

    with open("results/camelyon_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/camelyon_probe.json")


if __name__ == "__main__":
    main()
