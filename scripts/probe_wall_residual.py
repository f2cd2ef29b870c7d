"""TPU probe: epoch-driver wall vs dispatch wall at camelyon fused scale.

VERDICT round-3 weak item #2/next-item #3: the camelyon fused step was
15.5 ms device but 19.4 ms wall at K=4 — ~16 ms of per-dispatch
residual. Round 4 shipped two driver changes (train/loop.py):

  * _FetchPipeline — dispatch group g+1 before fetching group g's
    results (the ~40 ms host round trip overlaps device compute)
  * _GroupStager  — stage groups into rotating persistent (K, ...)
    stacks with donated dynamic_update_slice (no 2x jnp.stack transient)

This measures what a user-visible epoch actually costs now, through the
REAL grouped driver (`loop._train_epoch_grouped`: prep -> stage ->
dispatch -> pipelined fetch -> logger), against the raw back-to-back
dispatch wall of the same jitted multi-step (bench._time_steps — no
host bookkeeping at all), at the reference camelyon feature scale
(B=16, N=10k, 2048-dim, bf16, ln_fold).

Inputs are device-resident (a 4-batch pool of scale-variants, the
k-sweep construction) so the measurement isolates the driver residual;
host->HBM transfer through this box's tunnel is measured separately
(put_bw row) and discussed in RESULTS.md — a real TPU host feeds via
local DMA, this dev box feeds through a network tunnel.

Run ON TPU:  python scripts/probe_wall_residual.py
Results land in results/wall_residual_probe.json.
"""

from __future__ import annotations

import json
import sys
import time

if "--small" in sys.argv:  # CPU smoke mode: API check, no tunnel compiles
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

if "--small" not in sys.argv:
    enable_compilation_cache()
    B, N, M, I, D_FEAT = 16, 10_000, 5_000, 5_000, 2048
else:
    B, N, M, I, D_FEAT = 4, 40, 20, 20, 32
POOL = 4
# 48 steps -> 6 groups even at K=8: the last-group fetch + first-group
# fill edges amortize; 16 steps left K=8 with only 2 groups and its
# driver number dominated by edges.
STEPS_PER_EPOCH = 48


def make_conf(K, **over):
    from ips_tpu.config import config_from_dict
    base = dict(
        n_epoch=2, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1, ln_fold=True,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        steps_per_dispatch=K,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}})
    base.update(over)
    return config_from_dict(base)


def main():
    import bench
    from ips_tpu.train import loop as train_loop
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rows = {}
    rng = jax.random.PRNGKey(0)

    # host->HBM transfer bandwidth through this box's tunnel (context for
    # why honest host-fed epochs are IO-bound HERE, not on a real host)
    host_buf = np.zeros((B, N, D_FEAT), np.float16)  # 640 MB
    t0 = time.perf_counter()
    dev = jax.device_put(host_buf)
    jax.block_until_ready(dev)
    float(jnp.ravel(dev)[0])
    dt = time.perf_counter() - t0
    rows["put_bw_GBps"] = host_buf.nbytes / dt / 1e9
    print(f"host->device put: {host_buf.nbytes/1e6:.0f} MB in {dt:.2f}s "
          f"({rows['put_bw_GBps']:.2f} GB/s)", flush=True)
    del dev, host_buf

    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    # device-resident pool of distinct batches (k-sweep construction)
    pool = [feats * jnp.asarray(1.0 + 0.001 * i, jnp.bfloat16)
            for i in pool_range()]
    pool = [jax.block_until_ready(p) for p in pool]
    labels_host = np.arange(B) % 2

    def loader():
        return [{"input": pool[i % POOL],
                 "metastases": labels_host.copy()}
                for i in range(STEPS_PER_EPOCH)]

    for K in (4, 8):
        conf = make_conf(K)
        trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(1))

        # (a) raw dispatch wall of the jitted multi-step, K distinct
        # batches, no driver (the k-sweep baseline)
        scale = (1.0 + 0.001 * jnp.arange(K, dtype=jnp.float32)
                 )[:, None, None, None].astype(jnp.bfloat16)
        feats_k = feats[None] * scale
        mask_k = jnp.ones((K, B, N), bool)
        # EXACTLY the driver's dtypes ((B,) int32 labels stacked to
        # (K, B)) so (a) and (b) share one compiled multi-step
        labels_k = {"metastases": jnp.broadcast_to(
            jnp.asarray(labels_host, jnp.int32), (K, B))}
        weights_k = jnp.broadcast_to(jnp.ones((B,), jnp.float32),
                                     (K, B))
        rngs = jax.random.split(rng, K)
        lrs = jnp.full((K,), 3e-4, jnp.float32)

        def dispatch():
            losses, _, _ = trainer.fused_multi_step(
                feats_k, mask_k, labels_k, weights_k, rngs, lrs)
            return losses

        try:
            ms_dispatch = bench._time_steps(dispatch, 2, 2) * 1e3 / K
            rows[f"k{K}_dispatch_ms_per_step"] = ms_dispatch
            print(f"K={K} dispatch wall: {ms_dispatch:.2f} ms/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            rows[f"k{K}_dispatch_error"] = repr(e)[:300]
            print(f"K={K} dispatch failed: {e}", file=sys.stderr, flush=True)
            continue
        del feats_k

        # (b) the REAL grouped epoch driver over the device-resident pool
        def epoch(ep):
            logger = MetricsLogger(conf.task_list)
            return train_loop._train_epoch_grouped(
                trainer, loader(), ep, logger, conf,
                jax.random.PRNGKey(2 + ep), STEPS_PER_EPOCH)

        try:
            epoch(0)  # warm (jits already compiled by (a); driver paths)
            t0 = time.perf_counter()
            epoch(1)
            ms_driver = ((time.perf_counter() - t0) / STEPS_PER_EPOCH) * 1e3
            rows[f"k{K}_driver_ms_per_step"] = ms_driver
            rows[f"k{K}_driver_over_dispatch"] = ms_driver / ms_dispatch
            print(f"K={K} driver epoch wall: {ms_driver:.2f} ms/step "
                  f"({ms_driver/ms_dispatch:.3f}x dispatch)", flush=True)
        except Exception as e:  # noqa: BLE001
            rows[f"k{K}_driver_error"] = repr(e)[:300]
            print(f"K={K} driver failed: {e}", file=sys.stderr, flush=True)

    if "--small" in sys.argv:
        print("smoke mode: not writing results")
        return
    with open("results/wall_residual_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/wall_residual_probe.json")


def pool_range():
    return range(POOL)


if __name__ == "__main__":
    main()
