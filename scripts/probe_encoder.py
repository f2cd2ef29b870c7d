"""TPU probe: where do the selection-encoder milliseconds go?

Times the real truncated-ResNet18 encoder (the whole remaining hot path:
selection is at the encoder-only floor, RESULTS.md) stage by stage at
bench scale — (B*I)=1600 patches of (50, 50, 1) in bf16 — plus GEMM and
conv-layout micro-probes that bound what each candidate optimization
could buy.

Methodology: the axon-attached device costs ~2-3 ms per host sync and
per-dispatch RPC latency, which swamps sub-ms ops. Every probe therefore
repeats its op K times INSIDE one jitted fori_loop with a value-carrying
dependency (so XLA cannot elide iterations), and the per-op time is the
jit time divided by K, with the K=0 harness time subtracted.

Run ON TPU (no env overrides):  python scripts/probe_encoder.py
Results land in results/encoder_probe.json (+ stderr commentary).
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

BF16 = jnp.bfloat16
PEAK_BF16 = 197e12   # v5e MXU peak (bf16), FLOP/s
K_REP = 10


def host_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(leaf)[0])


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
    """Per-op seconds: K_REP in-jit repetitions minus the 0-rep harness."""

    def repeated(k, x, *consts):
        def body(_, carry):
            out = fn(carry, *consts)
            # full-output data dependence: mean touches EVERY element, so
            # XLA can neither DCE iterations nor narrow the op to a slice
            # (a [0]-element dependence lets it compute one output column)
            dep = jnp.mean(jnp.asarray(out, jnp.float32)) * 1e-30
            return carry + jnp.asarray(dep, carry.dtype)
        return jax.lax.fori_loop(0, k, body, x)

    jit_k = jax.jit(functools.partial(repeated, K_REP))
    jit_0 = jax.jit(functools.partial(repeated, 0))
    t_k = _timed(jit_k, x, *consts)
    t_0 = _timed(jit_0, x, *consts)
    return max(t_k - t_0, 1e-9) / K_REP


def report(rows, name, secs, flops=None):
    tf = (f", {flops / secs / 1e12:6.1f} TF/s "
          f"({flops / secs / PEAK_BF16:4.0%})") if flops else ""
    print(f"{name:34s} {secs * 1e3:8.3f} ms{tf}", file=sys.stderr,
          flush=True)
    rows.append({"name": name, "ms": secs * 1e3,
                 "tflops": (flops / secs / 1e12) if flops else None})


def conv(x, k, stride=1, padding=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=dn)


def conv_flops(x_shape, k_shape, out_hw):
    n = x_shape[0]
    kh, kw, cin, cout = k_shape
    oh, ow = out_hw
    return 2 * n * oh * ow * kh * kw * cin * cout


def main():
    dev = jax.devices()[0]
    print(f"probing on {dev}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    rows = []

    P = 1600                       # B*I patches per selection scan step
    x50 = jnp.asarray(rng.random((P, 50, 50, 1)), BF16)

    # --- real encoder, full forward (ground truth) -------------------------
    from ips_tpu.models.encoders import ConvPatchEncoder
    enc = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1, n_res_blocks=2,
                           dtype=BF16)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 50, 50, 1)),
                         train=False)
    f_stem = conv_flops((P, 50, 50, 1), (7, 7, 1, 64), (25, 25))
    f_l1 = 4 * conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13))
    f_l2 = (conv_flops((P, 13, 13, 64), (3, 3, 64, 128), (7, 7))
            + 3 * conv_flops((P, 7, 7, 128), (3, 3, 128, 128), (7, 7))
            + conv_flops((P, 13, 13, 64), (1, 1, 64, 128), (7, 7)))
    f_enc = f_stem + f_l1 + f_l2

    t = time_op(lambda x: enc.apply(variables, x, train=False), x50)
    report(rows, "encoder_full_1600x50x50", t, f_enc)

    # --- stage attribution (raw lax ops, eval-mode BN folds to scale) ------
    k_stem = jnp.asarray(rng.standard_normal((7, 7, 1, 64)) * .05, BF16)
    k33_64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * .05, BF16)
    k33_64_128 = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * .05, BF16)
    k33_128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * .05, BF16)
    k11_64_128 = jnp.asarray(rng.standard_normal((1, 1, 64, 128)) * .05, BF16)

    def stem(x, k):
        y = conv(x, k, stride=2, padding=3)
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    report(rows, "stem_conv7x7+pool", time_op(stem, x50, k_stem), f_stem)

    x13 = jnp.asarray(rng.random((P, 13, 13, 64)), BF16)

    def layer1(x, k):
        for _ in range(2):
            y = jax.nn.relu(conv(x, k))
            y = conv(y, k)
            x = jax.nn.relu(y + x)
        return x

    report(rows, "layer1_4x_conv3x3_64", time_op(layer1, x13, k33_64), f_l1)

    def layer2(x, ka, kb, kd):
        y = jax.nn.relu(conv(x, ka, stride=2))
        y = conv(y, kb)
        x = jax.nn.relu(y + conv(x, kd, stride=2, padding=0))
        y = jax.nn.relu(conv(x, kb))
        y = conv(y, kb)
        return jax.nn.relu(y + x)

    report(rows, "layer2_to_7x7_128",
           time_op(layer2, x13, k33_64_128, k33_128, k11_64_128), f_l2)

    # --- GEMM rooflines: what conv-as-GEMM COULD run at --------------------
    M = P * 13 * 13
    for N in (64, 128, 256):
        a = jnp.asarray(rng.random((M, 576)), BF16)
        b = jnp.asarray(rng.random((576, N)), BF16)
        report(rows, f"gemm_{M}x576x{N}",
               time_op(lambda a, b: a @ b, a, b), 2 * M * 576 * N)
    a = jnp.asarray(rng.random((P * 7 * 7, 1152)), BF16)
    b = jnp.asarray(rng.random((1152, 128)), BF16)
    report(rows, "gemm_78kx1152x128", time_op(lambda a, b: a @ b, a, b),
           2 * P * 49 * 1152 * 128)

    # --- conv layout probes ------------------------------------------------
    x16 = jnp.asarray(rng.random((P, 16, 16, 64)), BF16)
    report(rows, "conv3x3_64@16x16",
           time_op(lambda x, k: conv(x, k), x16, k33_64),
           conv_flops((P, 16, 16, 64), (3, 3, 64, 64), (16, 16)))
    report(rows, "conv3x3_64@13x13",
           time_op(lambda x, k: conv(x, k), x13, k33_64),
           conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13)))

    # W-packed: 16 patches side by side with 2-col separators
    kpack = 16
    Wp = kpack * 13 + 2 * kpack
    xp = jnp.asarray(rng.random((P // kpack, 13, Wp, 64)), BF16)
    report(rows, f"conv3x3_64@13x{Wp}_packed",
           time_op(lambda x, k: conv(x, k), xp, k33_64),
           conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13)))

    # HW-packed 4x4 grid of patches
    g = 4
    Hp = g * 13 + 2 * g
    xg = jnp.asarray(rng.random((P // (g * g), Hp, Hp, 64)), BF16)
    report(rows, f"conv3x3_64@{Hp}x{Hp}_grid",
           time_op(lambda x, k: conv(x, k), xg, k33_64),
           conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13)))

    # stem alternatives: fp32 input vs bf16; batch sensitivity
    x50_big = jnp.asarray(rng.random((2 * P, 50, 50, 1)), BF16)
    report(rows, "stem_conv7x7+pool_3200",
           time_op(stem, x50_big, k_stem), 2 * f_stem)

    # --- fused train step wall-time + analytic MFU -------------------------
    try:
        import bench
        conf = bench._conf("bfloat16", 16)
        from ips_tpu.train.steps import IPSTrainer
        trainer = IPSTrainer(conf)
        patches, mask, labels, weights = bench._batch(conf,
                                                      jax.random.PRNGKey(0))

        def step():
            return trainer.fused_step(patches, mask, labels, weights,
                                      jax.random.PRNGKey(0), 1e-3)
        for _ in range(2):
            host_sync(step())
        t0 = time.perf_counter()
        for _ in range(12):
            out = step()
        host_sync(out)
        t_step = (time.perf_counter() - t0) / 12
        # analytic FLOPs: selection encodes B*N patches once (no grad),
        # train re-encodes B*M with fwd+bwd (~3x fwd)
        per_patch = f_enc / P
        flops = (16 * 900) * per_patch + 3 * (16 * 100) * per_patch
        mfu = flops / t_step / PEAK_BF16
        print(f"fused_step: {t_step * 1e3:.1f} ms, analytic "
              f"{flops / 1e9:.0f} GFLOP (encoder only) -> MFU {mfu:.1%}",
              file=sys.stderr, flush=True)
        rows.append({"name": "fused_step", "ms": t_step * 1e3,
                     "gflop_analytic": flops / 1e9, "mfu": mfu})
    except Exception as e:  # noqa: BLE001
        print(f"fused-step timing unavailable: {e}", file=sys.stderr)

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/encoder_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"probe": "encoder", "rows": len(rows)}))


if __name__ == "__main__":
    main()
