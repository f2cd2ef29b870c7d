"""TPU probe: int8-quantized selection encoder, end to end (decision level).

Round-1/2 probes established that selection time IS encoder time (the
chunked scan beats even the raw one-shot encoder floor) and that the
remaining headroom is arithmetic, not schedule: v5e's int8 MXU path ran
~1.9x bf16 on the exact layer1 GEMM shape (scripts/probe_int8.py).
This probe settles whether that translates end to end by timing the
REAL `IPSTrainer._select` jit and `fused_step` at the bench headline
config (B=16, N=900, M=I=100) with `select_dtype` in {bfloat16, int8}.

Run ON TPU:  python scripts/probe_int8_e2e.py
Results land in results/int8_e2e_probe.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def host_sync(out):
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])


def timeit(fn, n_warmup=2, n_iter=10, n_groups=3):
    for _ in range(n_warmup):
        host_sync(fn())
    groups = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        host_sync(out)
        groups.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(groups)


def main():
    import bench
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    base_conf = bench._conf("bfloat16", 16)
    patches, mask, labels, weights = bench._batch(base_conf, rng)

    rows = {}
    jaccards = None
    sel_sets = {}
    for name, over in (("bf16", {}), ("int8", {"select_dtype": "int8"})):
        conf = base_conf.replace(**over) if over else base_conf
        trainer = IPSTrainer(conf)
        t_sel = timeit(lambda: trainer._select(
            trainer.state.params, trainer.state.batch_stats, patches, mask,
            rng))
        t_fused = timeit(lambda: trainer.fused_step(
            patches, mask, labels, weights, rng, 1e-3))
        # selection set for fidelity cross-check on-chip (same init params)
        sel = trainer._select(trainer.state.params, trainer.state.batch_stats,
                              patches, mask, rng)
        sel_sets[name] = jax.device_get(sel[2])
        rows[name] = {"select_ms": t_sel * 1e3, "fused_ms": t_fused * 1e3}
        print(f"{name:6s} select {t_sel * 1e3:7.2f} ms   fused "
              f"{t_fused * 1e3:7.2f} ms", file=sys.stderr, flush=True)

    # on-chip selection-set Jaccard (int8 vs bf16, fresh-init params)
    import numpy as np
    a, b = sel_sets["bf16"], sel_sets["int8"]
    jaccards = []
    for i in range(a.shape[0]):
        sa, sb = set(a[i].tolist()), set(b[i].tolist())
        jaccards.append(len(sa & sb) / len(sa | sb))
    jac = float(np.mean(jaccards))
    print(f"selection-set Jaccard(int8, bf16) = {jac:.3f}",
          file=sys.stderr, flush=True)

    n_patch = base_conf.B * base_conf.N
    out = {
        "config": {"B": base_conf.B, "N": base_conf.N, "M": base_conf.M,
                   "I": base_conf.I},
        "variants": rows,
        "jaccard_int8_vs_bf16": jac,
        "patches_per_s": {k: n_patch / (v["fused_ms"] / 1e3)
                          for k, v in rows.items()},
    }
    with open("results/int8_e2e_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
