"""TPU probe: where do the selection-encoder milliseconds go?

Times the real truncated-ResNet18 encoder (the whole remaining hot path:
selection is at the encoder-only floor, RESULTS.md) stage by stage at
bench scale — (B*I)=1600 patches of (50, 50, 1) in bf16 — plus GEMM and
conv-layout micro-probes that bound what each candidate optimization
could buy. Also reports compiler-counted FLOPs and MFU for the real
fused train step (VERDICT round-1 item 9).

Run ON TPU (no env overrides):  python scripts/probe_encoder.py
Results land in results/encoder_probe.json (+ stderr commentary).
"""

from __future__ import annotations

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


def host_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(leaf)[0])


def timeit(fn, *args, n_warmup=2, n_iter=12, n_groups=3):
    f = jax.jit(fn)
    for _ in range(n_warmup):
        host_sync(f(*args))
    groups = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f(*args)
        host_sync(out)
        groups.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(groups)


def report(name, secs, flops=None, extra=""):
    tf = f", {flops / secs / 1e12:6.1f} TF/s ({flops / secs / PEAK_BF16:4.0%})" \
        if flops else ""
    print(f"{name:34s} {secs * 1e3:8.3f} ms{tf} {extra}", file=sys.stderr,
          flush=True)
    return {"name": name, "ms": secs * 1e3,
            "tflops": (flops / secs / 1e12) if flops else None}


def conv(x, k, stride=1, padding=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=dn)


def conv_flops(x_shape, k_shape, out_hw, stride=1):
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

    def full(v, x):
        return enc.apply(v, x, train=False)

    t_full = timeit(full, variables, x50)
    # conservative FLOP count for the truncated r18 on 50x50
    f_stem = conv_flops((P, 50, 50, 1), (7, 7, 1, 64), (25, 25))
    f_l1 = 4 * conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13))
    f_l2 = (conv_flops((P, 13, 13, 64), (3, 3, 64, 128), (7, 7))
            + 3 * conv_flops((P, 7, 7, 128), (3, 3, 128, 128), (7, 7))
            + conv_flops((P, 13, 13, 64), (1, 1, 64, 128), (7, 7)))
    rows.append(report("encoder_full_1600x50x50", t_full,
                       f_stem + f_l1 + f_l2))

    # --- stage attribution (raw lax ops, eval-mode BN folds to scale) ------
    k_stem = jnp.asarray(rng.standard_normal((7, 7, 1, 64)) * .05, BF16)
    k33_64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * .05, BF16)
    k33_64_128 = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * .05, BF16)
    k33_128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * .05, BF16)
    k11_64_128 = jnp.asarray(rng.standard_normal((1, 1, 64, 128)) * .05, BF16)

    def stem(x):
        y = conv(x, k_stem, stride=2, padding=3)
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    t_stem = timeit(stem, x50)
    rows.append(report("stem_conv7x7+pool", t_stem, f_stem))

    x13 = jnp.asarray(rng.random((P, 13, 13, 64)), BF16)

    def layer1(x):
        for _ in range(2):
            y = jax.nn.relu(conv(x, k33_64))
            y = conv(y, k33_64)
            x = jax.nn.relu(y + x)
        return x

    t_l1 = timeit(layer1, x13)
    rows.append(report("layer1_4x_conv3x3_64", t_l1, f_l1))

    def layer2(x):
        y = jax.nn.relu(conv(x, k33_64_128, stride=2))
        y = conv(y, k33_128)
        x = jax.nn.relu(y + conv(x, k11_64_128, stride=2, padding=0))
        y = jax.nn.relu(conv(x, k33_128))
        y = conv(y, k33_128)
        return jax.nn.relu(y + x)

    t_l2 = timeit(layer2, x13)
    rows.append(report("layer2_to_7x7_128", t_l2, f_l2))

    # --- GEMM rooflines: what the conv COULD run at ------------------------
    M = P * 13 * 13
    for N in (64, 128, 256):
        a = jnp.asarray(rng.random((M, 576)), BF16)
        b = jnp.asarray(rng.random((576, N)), BF16)
        t = timeit(lambda a, b: a @ b, a, b)
        rows.append(report(f"gemm_{M}x576x{N}", t, 2 * M * 576 * N))
    a = jnp.asarray(rng.random((P * 7 * 7, 1152)), BF16)
    b = jnp.asarray(rng.random((1152, 128)), BF16)
    rows.append(report("gemm_78kx1152x128", timeit(lambda a, b: a @ b, a, b),
                       2 * P * 49 * 1152 * 128))

    # --- conv layout probes -------------------------------------------------
    # (a) same conv at padded 16x16 spatial: measures the 13->16 tile tax
    x16 = jnp.asarray(rng.random((P, 16, 16, 64)), BF16)
    t = timeit(lambda x: conv(x, k33_64), x16)
    rows.append(report("conv3x3_64@16x16", t,
                       conv_flops((P, 16, 16, 64), (3, 3, 64, 64), (16, 16))))
    t = timeit(lambda x: conv(x, k33_64), x13)
    rows.append(report("conv3x3_64@13x13", t,
                       conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13))))

    # (b) W-packed: 16 patches side by side with 2-col zero separators.
    #     Same useful FLOPs as conv3x3_64@13x13, bigger W tiles.
    kpack = 16
    Wp = kpack * 13 + 2 * kpack            # 13-wide patches + separators
    xp = jnp.asarray(rng.random((P // kpack, 13, Wp, 64)), BF16)
    t = timeit(lambda x: conv(x, k33_64), xp)
    rows.append(report(f"conv3x3_64@13x{Wp}_packed", t,
                       conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13))))

    # (c) HW-packed 4x4 grid of patches (what a packed layer1 would see)
    g = 4
    Hp = g * 13 + 2 * g
    xg = jnp.asarray(rng.random((P // (g * g), Hp, Hp, 64)), BF16)
    t = timeit(lambda x: conv(x, k33_64), xg)
    rows.append(report(f"conv3x3_64@{Hp}x{Hp}_grid", t,
                       conv_flops((P, 13, 13, 64), (3, 3, 64, 64), (13, 13))))

    # --- fused train step: compiler FLOPs + MFU (VERDICT item 9) -----------
    try:
        sys.path.insert(0, ".")
        import bench
        conf = bench._conf("bfloat16", 16)
        from ips_tpu.train.steps import IPSTrainer
        trainer = IPSTrainer(conf)
        patches, mask, labels, weights = bench._batch(conf,
                                                      jax.random.PRNGKey(0))
        lr = jnp.asarray(1e-3, jnp.float32)
        lowered = trainer._fused.lower(trainer.state, patches, mask, labels,
                                       weights, jax.random.PRNGKey(0), lr)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))

        def step():
            return trainer.fused_step(patches, mask, labels, weights,
                                      jax.random.PRNGKey(0), 1e-3)
        for _ in range(2):
            host_sync(step())
        t0 = time.perf_counter()
        for _ in range(8):
            out = step()
        host_sync(out)
        t_step = (time.perf_counter() - t0) / 8
        mfu = flops / t_step / PEAK_BF16
        print(f"fused_step: {t_step * 1e3:.1f} ms, XLA-counted "
              f"{flops / 1e9:.1f} GFLOP -> MFU {mfu:.1%}", file=sys.stderr,
              flush=True)
        rows.append({"name": "fused_step", "ms": t_step * 1e3,
                     "gflop_xla": flops / 1e9, "mfu": mfu})
    except Exception as e:  # noqa: BLE001
        print(f"fused-step cost analysis unavailable: {e}", file=sys.stderr)

    import os
    os.makedirs("results", exist_ok=True)
    with open("results/encoder_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"probe": "encoder", "rows": len(rows)}))


if __name__ == "__main__":
    main()
