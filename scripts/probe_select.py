"""TPU probe: real selection-path variants at bench scale (decision level).

Times the actual `IPSTrainer._select` jit (B=16, N=900, M=I=100, bf16 —
the bench.py headline config) under candidate structural variants, plus
the raw encoder floor, so choices are made on end-to-end numbers rather
than micro-op probes (which the remote tunnel distorts):

  * chunked   — current default: encode I-patch chunks inside the scan
  * preencode — ONE (B*N)-patch encoder dispatch, scan gathers emb rows
  * s2d       — space-to-depth stem variant
  * encode_floor — encoder-only on the full (B*N) batch (lower bound)
  * fused step end-to-end with the winning variant

Run ON TPU:  python scripts/probe_select.py
Results land in results/select_probe.json.
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
    rows = {}
    rng = jax.random.PRNGKey(0)

    variants = {
        "chunked": {},
        "preencode": {"preencode_select": True},
        "s2d": {"s2d_stem": True},
        "preencode+s2d": {"preencode_select": True, "s2d_stem": True},
    }
    base_conf = bench._conf("bfloat16", 16)
    patches, mask, labels, weights = bench._batch(base_conf, rng)

    for name, over in variants.items():
        conf = base_conf.replace(**over) if over else base_conf
        trainer = IPSTrainer(conf)
        t_sel = timeit(lambda: trainer._select(
            trainer.state.params, trainer.state.batch_stats, patches, mask,
            rng))
        t_fused = timeit(lambda: trainer.fused_step(
            patches, mask, labels, weights, rng, 1e-3))
        rows[name] = {"select_ms": t_sel * 1e3, "fused_ms": t_fused * 1e3}
        print(f"{name:16s} select {t_sel * 1e3:7.2f} ms   fused "
              f"{t_fused * 1e3:7.2f} ms", file=sys.stderr, flush=True)

    # encoder floor: one full-batch encode, nothing else
    trainer = IPSTrainer(base_conf)
    encode, _ = trainer._enc_score_fns(trainer.state.params,
                                       trainer.state.batch_stats)
    enc_jit = jax.jit(lambda p: encode(p.astype(jnp.bfloat16)))
    t_floor = timeit(lambda: enc_jit(patches))
    rows["encode_floor_14400"] = {"select_ms": t_floor * 1e3}
    print(f"encode_floor     {t_floor * 1e3:7.2f} ms", file=sys.stderr,
          flush=True)

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/select_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"probe": "select", "variants": list(rows)}))


if __name__ == "__main__":
    main()
