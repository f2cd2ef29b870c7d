"""TPU probe: does int8 arithmetic actually engage the v5e int8 MXU path?

v5e peaks at ~394 TOPS int8 vs ~197 TFLOPS bf16. Selection is no-grad
eval-mode scoring, so an int8-quantized selection encoder is the one
remaining arithmetic-level speedup (RESULTS.md: the schedule is already
at the floor). Before building it, verify XLA actually lowers int8
dot/conv to the fast path on this chip — if it silently upcasts, the
project is dead on arrival.

Run ON TPU:  python scripts/probe_int8.py
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
            dep = jnp.mean(jnp.asarray(out, jnp.float32)) * 1e-30
            return carry + jnp.asarray(dep, carry.dtype)
        return jax.lax.fori_loop(0, k, body, x)

    t_k = _timed(jax.jit(functools.partial(repeated, K_REP)), x, *consts)
    t_0 = _timed(jax.jit(functools.partial(repeated, 0)), x, *consts)
    return max(t_k - t_0, 1e-9) / K_REP


def conv(x, k, stride=1, padding=1, acc=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    kw = {"preferred_element_type": acc} if acc else {}
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=dn, **kw)


def main():
    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    rows = []

    def report(name, secs, ops):
        print(f"{name:30s} {secs * 1e3:8.3f} ms, "
              f"{ops / secs / 1e12:6.1f} Tops/s", file=sys.stderr,
              flush=True)
        rows.append({"name": name, "ms": secs * 1e3,
                     "tops": ops / secs / 1e12})

    # GEMM: layer1-conv-shaped (M=270400, K=576, N=64) and a fat control
    for (M, K, N) in ((270400, 576, 64), (8192, 2048, 2048)):
        ops = 2 * M * K * N
        a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        t = time_op(lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=jnp.int32), a8, b8)
        report(f"gemm_int8_{M}x{K}x{N}", t, ops)
        abf = jnp.asarray(rng.random((M, K)), jnp.bfloat16)
        bbf = jnp.asarray(rng.random((K, N)), jnp.bfloat16)
        t = time_op(lambda a, b: a @ b, abf, bbf)
        report(f"gemm_bf16_{M}x{K}x{N}", t, ops)

    # conv3x3: the layer1 shape, int8 vs bf16
    P = 1600
    x8 = jnp.asarray(rng.integers(-127, 127, (P, 13, 13, 64)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 64, 64)), jnp.int8)
    ops = 2 * P * 13 * 13 * 9 * 64 * 64
    try:
        t = time_op(lambda x, k: conv(x, k, acc=jnp.int32), x8, k8)
        report("conv3x3_int8_64@13x13", t, ops)
    except Exception as e:  # noqa: BLE001
        print(f"int8 conv unsupported: {type(e).__name__}: {e}",
              file=sys.stderr)
        rows.append({"name": "conv3x3_int8_64@13x13", "error": str(e)})
    xb = jnp.asarray(rng.random((P, 13, 13, 64)), jnp.bfloat16)
    kb = jnp.asarray(rng.random((3, 3, 64, 64)), jnp.bfloat16)
    t = time_op(lambda x, k: conv(x, k), xb, kb)
    report("conv3x3_bf16_64@13x13", t, ops)

    # stem-shaped conv: 7x7/2 on (P, 50, 50, 1)
    ops = 2 * P * 25 * 25 * 49 * 1 * 64
    x8 = jnp.asarray(rng.integers(0, 127, (P, 50, 50, 1)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (7, 7, 1, 64)), jnp.int8)
    try:
        t = time_op(lambda x, k: conv(x, k, stride=2, padding=3,
                                      acc=jnp.int32), x8, k8)
        report("stem_int8", t, ops)
    except Exception as e:  # noqa: BLE001
        print(f"int8 stem unsupported: {e}", file=sys.stderr)

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/int8_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"probe": "int8", "rows": len(rows)}))


if __name__ == "__main__":
    main()
