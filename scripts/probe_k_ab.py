"""TPU probe: settle the camelyon steps_per_dispatch default (K=4 vs 8).

VERDICT round-4 weak item #1: the shipped `steps_per_dispatch: 8` rested
on SESSION-INCONSISTENT measurements — the first session measured K=8 as
an end-to-end regression (19.50 vs 22.06 ms/step driver), a later session
(different tunnel weather) measured it winning (30.7 vs 27.0). This runs
the decisive same-session A/B: the REAL grouped epoch driver
(`loop._train_epoch_grouped`, epoch granularity, device-resident pool —
the probe_wall_residual instrument) for K=4 and K=8, the WHOLE SEQUENCE
REPEATED (A/B/A/B), with a host->device bandwidth control row before
each repetition so tunnel weather is on the record.

Note on "full CLI": an honest host-fed CLI epoch at this scale moves
640 MB/step through this box's network tunnel (0.01-0.03 GB/s measured
-> 20-60 s/step of pure IO); epoch wall would measure tunnel weather,
not the driver. A real TPU host feeds via local DMA. The grouped epoch
driver over a device-resident pool is exactly what the CLI runs minus
that tunnel artifact, so it is the decision instrument (RESULTS.md
"Dispatch-group driver residual" context row).

Run ON TPU:  python scripts/probe_k_ab.py
Results land in results/k_ab_r5.json.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import probe_wall_residual as pw  # noqa: E402  (enables compilation cache)

B, N, D_FEAT = pw.B, pw.N, pw.D_FEAT
POOL, STEPS_PER_EPOCH = pw.POOL, pw.STEPS_PER_EPOCH
KS = (4, 8)
N_REPS = 2


def put_bw() -> float:
    """Tunnel-weather control: host->device bandwidth on a 64 MB put."""
    buf = np.zeros((B, N // 10, D_FEAT), np.float16)
    t0 = time.perf_counter()
    dev = jax.device_put(buf)
    jax.block_until_ready(dev)
    float(jnp.ravel(dev)[0])
    dt = time.perf_counter() - t0
    del dev
    return buf.nbytes / dt / 1e9


def main():
    import bench
    from ips_tpu.train import loop as train_loop
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    pool = [jax.block_until_ready(
        feats * jnp.asarray(1.0 + 0.001 * i, jnp.bfloat16))
        for i in range(POOL)]
    labels_host = np.arange(B) % 2

    def loader():
        return [{"input": pool[i % POOL], "metastases": labels_host.copy()}
                for i in range(STEPS_PER_EPOCH)]

    # One trainer per K, shared across repetitions: rep 2 re-times the
    # SAME compiled fns, so any K=4-vs-K=8 difference that survives both
    # reps is real, not compile/retrace noise. The stacked (K, B, N, D)
    # dispatch inputs are built per arm and freed before the driver phase
    # — keeping the K=8 stack (5.1 GB) resident next to the driver's two
    # rotating stager buffers would exceed 16 GB HBM.
    trainers, confs = {}, {}
    for K in KS:
        confs[K] = pw.make_conf(K)
        trainers[K] = IPSTrainer(confs[K], rng=jax.random.PRNGKey(1))

    rows = {"reps": []}
    for rep in range(N_REPS):
        r = {"put_bw_GBps": put_bw()}
        print(f"rep {rep}: tunnel bw {r['put_bw_GBps']:.3f} GB/s", flush=True)
        for K in KS:
            trainer = trainers[K]
            scale = (1.0 + 0.001 * jnp.arange(K, dtype=jnp.float32)
                     )[:, None, None, None].astype(jnp.bfloat16)
            s = dict(
                feats_k=feats[None] * scale,
                mask_k=jnp.ones((K, B, N), bool),
                labels_k={"metastases": jnp.broadcast_to(
                    jnp.asarray(labels_host, jnp.int32), (K, B))},
                weights_k=jnp.broadcast_to(jnp.ones((B,), jnp.float32),
                                           (K, B)),
                rngs=jax.random.split(rng, K),
                lrs=jnp.full((K,), 3e-4, jnp.float32))

            def dispatch():
                losses, _, _ = trainer.fused_multi_step(
                    s["feats_k"], s["mask_k"], s["labels_k"],
                    s["weights_k"], s["rngs"], s["lrs"])
                return losses

            ms_disp = bench._time_steps(dispatch, 2, 2) * 1e3 / K
            r[f"k{K}_dispatch_ms"] = ms_disp
            del s, dispatch

            def epoch(ep):
                logger = MetricsLogger(confs[K].task_list)
                return train_loop._train_epoch_grouped(
                    trainer, loader(), ep, logger, confs[K],
                    jax.random.PRNGKey(2 + ep), STEPS_PER_EPOCH)

            epoch(0)  # warm driver paths
            t0 = time.perf_counter()
            epoch(1)
            ms_drv = (time.perf_counter() - t0) / STEPS_PER_EPOCH * 1e3
            r[f"k{K}_driver_ms"] = ms_drv
            r[f"k{K}_ratio"] = ms_drv / ms_disp
            print(f"rep {rep} K={K}: dispatch {ms_disp:.2f} driver "
                  f"{ms_drv:.2f} ms/step ({ms_drv/ms_disp:.3f}x)", flush=True)
        rows["reps"].append(r)

    drv = {K: [r[f"k{K}_driver_ms"] for r in rows["reps"]] for K in KS}
    winner = min(KS, key=lambda K: sum(drv[K]))
    consistent = all(
        (r["k4_driver_ms"] < r["k8_driver_ms"]) == (winner == 4)
        for r in rows["reps"])
    rows["winner_driver_ms"] = winner
    rows["consistent_across_reps"] = consistent
    print(f"winner: K={winner} (consistent across reps: {consistent})",
          flush=True)
    with open("results/k_ab_r5.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/k_ab_r5.json")


if __name__ == "__main__":
    main()
