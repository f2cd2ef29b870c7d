"""TPU probe: selection-scan overhead vs the per-chunk encode floor.

probe_train2.py measured the encoder at ~1.0 µs/patch for a 1600-patch
batch (in-jit repetition), which puts the TRUE floor for selection's
9 sequential 1600-patch chunk encodes at ~14.5 ms — yet selection costs
~22 ms inside the fused step. Round 1 compared against a ONE-SHOT
14400-patch dispatch (23.6 ms standalone), which is itself ~60% less
efficient per patch, and wrongly concluded "<1 ms overhead".

This probe measures, all with in-jit repetition (K=8):

  * enc_scan   — a fori_loop doing ONLY the 9 chunk encodes (the real
                 sequential floor with the same chunking)
  * select_uK  — the real `_select_impl` with lax.scan unroll=K for
                 K in 1, 2, 4, 8. Unrolling is semantics-identical but
                 lets XLA overlap iteration k's scoring/top-k/gathers
                 with iteration k+1's convs instead of serializing at
                 every carry boundary.
  * fused_uK   — the standalone fused select+train step (33 ms >> the
                 ~5 ms dispatch floor, so plain timing is honest) for
                 unroll 1 and the best K.

Run ON TPU:  python scripts/probe_select2.py
Results land in results/select2_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from scripts.probe_train2 import time_op  # noqa: E402  (enables jit cache)


def timeit(fn, n_warmup=2, n_iter=8):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.models.ips_net import IPSModel
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf0 = bench._conf("bfloat16", 16)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf0, rng)
    patches = jax.device_put(patches.astype(jnp.bfloat16))
    lr = jnp.asarray(1e-3, jnp.float32)
    rows = {}

    # --- pure sequential encode floor: 9 chunks of (B, I) ---------------
    t0 = IPSTrainer(conf0)
    variables = {"params": t0.state.params,
                 "batch_stats": t0.state.batch_stats}
    I = conf0.I

    def enc_scan(p):
        def body(k, acc):
            chunk = jax.lax.dynamic_slice_in_dim(p, k * I, I, axis=1)
            emb = t0.model.apply(variables, chunk, train=False,
                                 method=IPSModel.encode)
            return acc + jnp.sum(emb.astype(jnp.float32))

        return jax.lax.fori_loop(0, conf0.N // I, body,
                                 jnp.zeros((), jnp.float32))

    rows["enc_scan_floor"] = time_op(enc_scan, patches) * 1e3
    print(f"enc_scan_floor: {rows['enc_scan_floor']:.2f} ms", flush=True)

    # --- the real selection at increasing scan unroll --------------------
    trainers = {}
    for u in (1, 2, 4, 8):
        tr = IPSTrainer(conf0.replace(select_unroll=u))
        tr.state = t0.state           # identical weights across variants
        trainers[u] = tr

        def sel(p, tr=tr):
            return tr._select_impl(tr.state.params, tr.state.batch_stats,
                                   p, mask, rng)

        rows[f"select_u{u}"] = time_op(sel, patches) * 1e3
        print(f"select_u{u}: {rows[f'select_u{u}']:.2f} ms", flush=True)

    # --- end-to-end fused step for unroll 1 and the best unroll ----------
    best = min((u for u in (1, 2, 4, 8)),
               key=lambda u: rows[f"select_u{u}"])
    for u in sorted({1, best}):
        tr = trainers[u]
        holder = {"state": tr.state}
        fused = jax.jit(tr._fused_impl)

        def step(tr=tr, holder=holder, fused=fused):
            new_state, loss, _, _ = fused(holder["state"], patches, mask,
                                          labels, weights, rng, lr)
            holder["state"] = new_state
            return loss

        rows[f"fused_u{u}"] = timeit(step) * 1e3
        print(f"fused_u{u}: {rows[f'fused_u{u}']:.2f} ms", flush=True)
    rows["best_unroll"] = best

    with open("results/select2_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/select2_probe.json")


if __name__ == "__main__":
    main()
