"""TPU probe: layer1 residual-block conv alternatives (decision level).

Per-stage probes (scripts/probe_encoder.py, RESULTS.md) put layer1's
3x3x64->64 convs at ~37 TF/s — the weakest encoder stage — because the
64-channel contraction half-fills the MXU's 128 lanes. Candidates that
could beat XLA's native conv, timed on the REAL layer1 shape
((B*I)=1600 patches of 13x13x64 bf16, eval-mode folded BN, both basic
blocks incl. residual adds):

  xla_conv   — lax.conv_general_dilated per conv (what the encoder does)
  tap9       — conv as 9 accumulated dot_generals (K=N=64)
  tap9_pair  — pack 2 patches' channels -> (800, 13, 13, 128), weights
               block-diagonal (128x128): 2x the FLOPs but full MXU tiles
  pallas_pair— one fused Pallas kernel per basic block on the paired
               layout: 9-tap GEMMs + folded BN + ReLU + residual without
               leaving VMEM

All variants are checked against xla_conv numerics first (bf16
tolerance), then timed with in-jit fori_loop repetition (the remote
tunnel swamps sub-ms ops otherwise; see probe_encoder.py).

Run ON TPU:  python scripts/probe_conv.py
Results land in results/conv_probe.json.
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
P, S, C = 1600, 13, 64          # patches, spatial, channels (layer1 shape)
K_REP = 10
PEAK = 197e12                    # v5e bf16 peak FLOP/s
# useful FLOPs for layer1 = 2 blocks x 2 convs (residuals ~free)
FLOPS = 4 * P * S * S * (9 * C) * C * 2


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

    jit_k = jax.jit(functools.partial(repeated, K_REP))
    jit_0 = jax.jit(functools.partial(repeated, 0))
    return max(_timed(jit_k, x, *consts) - _timed(jit_0, x, *consts),
               1e-9) / K_REP


# ---------------------------------------------------------------- weights
def make_block_params(rng, c):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "w1": (jax.random.normal(k1, (3, 3, c, c), jnp.float32)
               * (0.05 / np.sqrt(c))).astype(BF16),
        "w2": (jax.random.normal(k2, (3, 3, c, c), jnp.float32)
               * (0.05 / np.sqrt(c))).astype(BF16),
        # folded eval-mode BN: per-channel scale/shift
        "s1": 1.0 + 0.1 * jax.random.normal(k3, (c,), jnp.float32),
        "b1": 0.1 * jax.random.normal(k4, (c,), jnp.float32),
        "s2": 1.0 + 0.1 * jax.random.normal(k3, (c,), jnp.float32),
        "b2": 0.1 * jax.random.normal(k4, (c,), jnp.float32),
    }


# ------------------------------------------------------------- xla_conv
def conv_xla(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def block_xla(x, p):
    h = jax.nn.relu(conv_xla(x, p["w1"]) * p["s1"] + p["b1"]).astype(BF16)
    y = conv_xla(h, p["w2"]) * p["s2"] + p["b2"]
    return jax.nn.relu(y + x.astype(jnp.float32)).astype(BF16)


def layer1_xla(x, p0, p1):
    return block_xla(block_xla(x, p0), p1)


# ---------------------------------------------------------------- tap9
def conv_tap9(x, w):
    """3x3 conv as 9 accumulated dot_generals on shifted slices."""
    n, s, _, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, s, s, w.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + s, dx + s, c))
            acc = acc + jax.lax.dot_general(
                sl, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def block_tap9(x, p):
    h = jax.nn.relu(conv_tap9(x, p["w1"]) * p["s1"] + p["b1"]).astype(BF16)
    y = conv_tap9(x=h, w=p["w2"]) * p["s2"] + p["b2"]
    return jax.nn.relu(y + x.astype(jnp.float32)).astype(BF16)


def layer1_tap9(x, p0, p1):
    return block_tap9(block_tap9(x, p0), p1)


# ----------------------------------------------------------- paired layout
def pair_pack(x):
    """(P, s, s, c) -> (P/2, s, s, 2c): two patches share the lane dim."""
    n, s, _, c = x.shape
    return (x.reshape(n // 2, 2, s, s, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(n // 2, s, s, 2 * c))


def pair_unpack(y, c):
    n2, s, _, c2 = y.shape
    return (y.reshape(n2, s, s, 2, c)
            .transpose(0, 3, 1, 2, 4)
            .reshape(n2 * 2, s, s, c))


def pair_params(p, c):
    """Block-diagonalize weights, tile BN terms over the paired lanes."""
    def bd(w):
        out = jnp.zeros((3, 3, 2 * c, 2 * c), w.dtype)
        out = out.at[:, :, :c, :c].set(w)
        return out.at[:, :, c:, c:].set(w)
    return {"w1": bd(p["w1"]), "w2": bd(p["w2"]),
            "s1": jnp.tile(p["s1"], 2), "b1": jnp.tile(p["b1"], 2),
            "s2": jnp.tile(p["s2"], 2), "b2": jnp.tile(p["b2"], 2)}


def layer1_tap9_pair(x, q0, q1, c):
    xp = pair_pack(x)
    y = block_tap9(block_tap9(xp, q0), q1)
    return pair_unpack(y, c)


# ------------------------------------------------------------ pallas_pair
def _pallas_block_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, o_ref):
    import jax.experimental.pallas as pl  # noqa: F401  (doc anchor)
    t, s, _, c2 = x_ref.shape
    x = x_ref[:]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t, s, s, c2), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(xp, (0, dy, dx, 0),
                               (t, dy + s, dx + s, c2))
            acc = acc + jax.lax.dot_general(
                sl, w1_ref[dy * 3 + dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    h = jax.nn.relu(acc * s1_ref[0] + b1_ref[0]).astype(BF16)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc2 = jnp.zeros((t, s, s, c2), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(hp, (0, dy, dx, 0),
                               (t, dy + s, dx + s, c2))
            acc2 = acc2 + jax.lax.dot_general(
                sl, w2_ref[dy * 3 + dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y = acc2 * s2_ref[0] + b2_ref[0] + x.astype(jnp.float32)
    o_ref[:] = jax.nn.relu(y).astype(BF16)


def pallas_block(xp, q, tile):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n2, s, _, c2 = xp.shape
    w1 = q["w1"].reshape(9, c2, c2)
    w2 = q["w2"].reshape(9, c2, c2)
    grid = (n2 // tile,)
    spec_x = pl.BlockSpec((tile, s, s, c2), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((9, c2, c2), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, c2), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pallas_block_kernel,
        out_shape=jax.ShapeDtypeStruct((n2, s, s, c2), BF16),
        grid=grid,
        in_specs=[spec_x, spec_w, spec_v, spec_v, spec_w, spec_v, spec_v],
        out_specs=spec_x,
        interpret=jax.default_backend() == "cpu",
    )(xp, w1, q["s1"].reshape(1, c2), q["b1"].reshape(1, c2),
      w2, q["s2"].reshape(1, c2), q["b2"].reshape(1, c2))


def layer1_pallas_pair(x, q0, q1, c, tile):
    xp = pair_pack(x)
    y = pallas_block(pallas_block(xp, q0, tile), q1, tile)
    return pair_unpack(y, c)


# ---------------------------------------------------------------- driver
def main():
    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    kx, k0, k1 = jax.random.split(rng, 3)
    x = (jax.random.normal(kx, (P, S, S, C), jnp.float32) * 0.5).astype(BF16)
    p0 = make_block_params(k0, C)
    p1 = make_block_params(k1, C)
    q0, q1 = pair_params(p0, C), pair_params(p1, C)

    want = jax.jit(layer1_xla)(x, p0, p1)
    rows, errs = {}, {}

    variants = {
        "xla_conv": lambda x: layer1_xla(x, p0, p1),
        "tap9": lambda x: layer1_tap9(x, p0, p1),
        "tap9_pair": lambda x: layer1_tap9_pair(x, q0, q1, C),
        "pallas_pair_t32": lambda x: layer1_pallas_pair(x, q0, q1, C, 32),
        "pallas_pair_t64": lambda x: layer1_pallas_pair(x, q0, q1, C, 64),
    }
    for name, fn in variants.items():
        try:
            got = jax.jit(fn)(x)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
            errs[name] = err
            if err > 0.1:
                print(f"{name}: NUMERICS OFF (max abs err {err:.4f})",
                      file=sys.stderr, flush=True)
            t = time_op(fn, x)
            rows[name] = {"ms": t * 1e3, "tf_s": FLOPS / t / 1e12,
                          "max_abs_err": err}
            print(f"{name:18s} {t * 1e3:7.3f} ms   {FLOPS / t / 1e12:6.1f} "
                  f"TF/s useful   err {err:.2e}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            rows[name] = {"error": repr(e)[:500]}
            print(f"{name}: FAILED {e!r}", file=sys.stderr, flush=True)

    out = {"shape": [P, S, S, C], "useful_flops": FLOPS, "variants": rows}
    with open("results/conv_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
