"""TPU probe: scorer implementations vs the HBM roofline (VERDICT item 8).

The selection scorer reads the (B, L, D) embedding tensor once per scan
step; it is memory-bound, so the question is which implementation runs at
the HBM roofline. Probes `fast_scores` (query-folded single GEMM, XLA)
vs `pallas_scores` (fused kernel) at megapixel-MNIST scale (B=16, L=200,
D=128) and CAMELYON scale (B=16, L=10k, D=512), in fp32 and bf16 x.

Same in-jit repetition methodology as probe_encoder.py (the remote
device's per-sync latency swamps sub-ms ops otherwise).

Run ON TPU:  python scripts/probe_scorer.py
Results land in results/scorer_probe.json.
"""

from __future__ import annotations

import functools
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

HBM_BW = 819e9          # v5e HBM bandwidth, bytes/s
K_REP = 10


def host_sync(out):
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])


def _timed(jitted, *args, n_iter=6, n_groups=3):
    for _ in range(2):
        host_sync(jitted(*args))
    groups = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = jitted(*args)
        host_sync(out)
        groups.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(groups)


def time_op(fn, x, *consts):
    def repeated(k, x, *consts):
        def body(_, carry):
            out = fn(carry, *consts)
            dep = jnp.asarray(out, carry.dtype).ravel()[0] * jnp.asarray(
                1e-30, carry.dtype)
            return carry + dep
        return jax.lax.fori_loop(0, k, body, x)

    t_k = _timed(jax.jit(functools.partial(repeated, K_REP)), x, *consts)
    t_0 = _timed(jax.jit(functools.partial(repeated, 0)), x, *consts)
    return max(t_k - t_0, 1e-9) / K_REP


def main():
    from ips_tpu.ops.score_kernel import fast_scores, pallas_scores
    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    rows = []

    for tag, B, L, D, TH in (("mnist", 16, 200, 128, 32),
                             ("camelyon", 16, 10000, 512, 8)):
        for dt_name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = jnp.asarray(rng.random((B, L, D)), dt)
            w = jnp.asarray(rng.random((D, TH)), jnp.float32)
            mask = jnp.ones((B, L), bool)
            bytes_x = B * L * D * x.dtype.itemsize
            roof = bytes_x / HBM_BW

            t_fast = time_op(lambda x, w, m: fast_scores(x, w, m), x, w,
                             mask)
            # attribution rows: the logits GEMM alone (no softmax
            # epilogue), the same GEMM as the pallas kernel, and a pure
            # read-reduction calibrating achievable HBM read bandwidth
            t_gemm = time_op(
                lambda x, w: jnp.einsum("bld,dc->blc", x, w,
                                        preferred_element_type=jnp.float32),
                x, w)
            t_read = time_op(
                lambda x: jnp.sum(x.astype(jnp.float32), axis=(1, 2)), x)
            row = {"case": f"{tag}_{dt_name}", "roofline_ms": roof * 1e3,
                   "fast_ms": t_fast * 1e3, "gemm_only_ms": t_gemm * 1e3,
                   "read_only_ms": t_read * 1e3}
            line = (f"{tag:9s} {dt_name}: fast {t_fast * 1e3:7.3f} ms "
                    f"(roofline {roof * 1e3:.3f} ms, "
                    f"{roof / t_fast:4.0%} of SoL) | gemm-only "
                    f"{t_gemm * 1e3:7.3f} | read-only {t_read * 1e3:7.3f}")
            try:
                from ips_tpu.ops.score_kernel import (_pallas_logits,
                                                      _round_up)
                n_t = -(-L // 2048)
                TL = _round_up(-(-L // n_t), 128)
                wp = jnp.pad(w.astype(x.dtype),
                             ((0, 0), (0, _round_up(TH, 8) - TH)))
                t_pg = time_op(functools.partial(_pallas_logits, TL=TL,
                                                 interpret=False), x, wp)
                row["pallas_gemm_ms"] = t_pg * 1e3
                line += f" | pallas-gemm {t_pg * 1e3:7.3f}"
            except Exception as e:  # noqa: BLE001
                line += f" | pallas-gemm failed: {type(e).__name__}"
            try:
                t_pal = time_op(
                    lambda x, w, m: pallas_scores(x, w, m, interpret=False),
                    x, w, mask)
                row["pallas_ms"] = t_pal * 1e3
                line += (f" | pallas {t_pal * 1e3:7.3f} ms "
                         f"({roof / t_pal:4.0%} of SoL)")
            except Exception as e:  # noqa: BLE001
                line += f" | pallas failed: {type(e).__name__}"
            print(line, file=sys.stderr, flush=True)
            rows.append(row)

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/scorer_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"probe": "scorer", "rows": len(rows)}))


if __name__ == "__main__":
    main()
