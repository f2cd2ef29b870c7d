"""TPU probe: can a restructured input-grad beat XLA's transposed conv?

The gradient-step decomposition (RESULTS.md round 2) pinned the train
half's main drag on data-grad convs: ~4.6 ms vs ~1.6 ms for the same
convs forward (~3x), typical for XLA's dilated/transposed lowering at
13x13-25x25 spatials. VERDICT round-3 item 8 asks for one targeted
experiment to confirm or break the "XLA-locked" conclusion.

Two candidate reformulations, both verified bit-comparable (fp32
tolerance) against `jax.vjp` on CPU before any timing:

  * explicit_s1 — input-grad of a stride-1 conv written as a plain
    forward conv of dy with the spatially-flipped, io-swapped kernel.
    If this beats the vjp conv, XLA's transpose path carries avoidable
    per-step overhead (e.g. kernel relayout); if it ties, the stride-1
    data-grads are already minimal.
  * phase_s2 — input-grad of a stride-2 conv decomposed into s^2=4
    dense stride-1 convs over kernel-tap phases, interleaved into the
    full-resolution grad. This is the space-to-batch/"phase" form that
    avoids computing over the zeros XLA's lhs_dilation inserts; FLOPs
    equal the true minimum (1/4 of the naive dilated arithmetic).

Shapes are the real encoder backward shapes at the MNIST bench config
(chunk = B*M = 1600 patches): layer1 3x3 s1 @ 13x13x64 and layer2
3x3 s2 64->128 @ 13x13 (the two dominant data-grad convs; reference
encoder truncation architecture/ips_net.py:33-52).

Verify on CPU:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/probe_dgrad.py --verify
Time on TPU:    python scripts/probe_dgrad.py
Results land in results/dgrad_probe.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K_REP = 16
CHUNK = 1600  # B*M at the bench config


def conv_fwd(x, w, stride, pad):
    """NHWC/HWIO conv, torch padding semantics."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def vjp_input_grad(x, w, dy, stride, pad):
    """XLA's own input-grad (what the train step runs)."""
    _, pullback = jax.vjp(lambda x_: conv_fwd(x_, w, stride, pad), x)
    return pullback(dy)[0]


def explicit_s1_input_grad(w, dy, pad):
    """Stride-1 input-grad as a forward conv: dy * flip(w), io swapped.

    dx[p] = sum_t dy[p + pad - t] w[t]  -> correlation of dy with the
    spatially flipped kernel, 'co' contracted, padding k-1-pad.
    """
    k = w.shape[0]
    w_t = jnp.flip(w, (0, 1)).swapaxes(2, 3)  # HWIO with i<->o swapped
    return conv_fwd(dy, w_t, 1, k - 1 - pad)


def _phase_meta(H_in, k, s, pad, r):
    """Tap phase r of a 1-D stride-s input-grad: positions p with
    (p + pad) % s == r, written v = (p + pad) // s. Returns
    (n_taps, v_min, length)."""
    taps = list(range(r, k, s))
    ps = [p for p in range(H_in) if (p + pad) % s == r]
    if not ps or not taps:
        return 0, 0, 0
    v_min = (ps[0] + pad) // s
    return len(taps), v_min, len(ps)


def phase_s2_input_grad(w, dy, H_in, s, pad):
    """Stride-s input-grad as s^2 dense stride-1 convs + interleave.

    For phase (rh, rw): dx[v] = sum_u dy[v - u] w_sub[u] with
    w_sub = w[rh::s, rw::s]; realized as a conv of dy with the flipped,
    io-swapped subkernel at padding chosen so output index o maps to
    v = o + (n_taps - 1) - lo, covering exactly v in
    [v_min, v_min + length).
    """
    k = w.shape[0]
    H_out = dy.shape[1]
    dx = jnp.zeros((dy.shape[0], H_in, H_in, w.shape[2]), dy.dtype)
    for rh in range(s):
        nh, vh0, Lh = _phase_meta(H_in, k, s, pad, rh)
        if Lh == 0:
            continue
        for rw in range(s):
            nw, vw0, Lw = _phase_meta(H_in, k, s, pad, rw)
            if Lw == 0:
                continue
            w_sub = w[rh::s, rw::s]
            w_t = jnp.flip(w_sub, (0, 1)).swapaxes(2, 3)
            lo_h = (nh - 1) - vh0
            hi_h = Lh - H_out - lo_h + (nh - 1)
            lo_w = (nw - 1) - vw0
            hi_w = Lw - H_out - lo_w + (nw - 1)
            ph = jax.lax.conv_general_dilated(
                dy, w_t, window_strides=(1, 1),
                padding=((lo_h, hi_h), (lo_w, hi_w)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            p0h = s * vh0 + rh - pad
            p0w = s * vw0 + rw - pad
            dx = dx.at[:, p0h::s, p0w::s, :].set(ph)
    return dx


# --- cases: the two dominant data-grad convs of the bench encoder ---

def cases(dtype):
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    return {
        # layer1 basic-block conv: 3x3 s1, 64ch @ 13x13
        "s1_3x3_64": dict(x=t(CHUNK, 13, 13, 64), w=t(3, 3, 64, 64),
                          dy=t(CHUNK, 13, 13, 64), stride=1, pad=1),
        # layer2 downsampling conv: 3x3 s2, 64->128 @ 13x13 -> 7x7
        "s2_3x3_64_128": dict(x=t(CHUNK, 13, 13, 64), w=t(3, 3, 64, 128),
                              dy=t(CHUNK, 7, 7, 128), stride=2, pad=1),
        # layer2 residual downsample: 1x1 s2, 64->128
        "s2_1x1_64_128": dict(x=t(CHUNK, 13, 13, 64), w=t(1, 1, 64, 128),
                              dy=t(CHUNK, 7, 7, 128), stride=2, pad=0),
    }


def alt_grad(c):
    if c["stride"] == 1:
        return explicit_s1_input_grad(c["w"], c["dy"], c["pad"])
    return phase_s2_input_grad(c["w"], c["dy"], c["x"].shape[1],
                               c["stride"], c["pad"])


def verify():
    for name, c in cases(jnp.float32).items():
        ref = vjp_input_grad(c["x"], c["w"], c["dy"], c["stride"], c["pad"])
        alt = alt_grad(c)
        err = float(jnp.max(jnp.abs(ref - alt))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        status = "OK" if err < 1e-5 else "FAIL"
        print(f"{name}: rel err {err:.2e} {status}")
        assert err < 1e-5, name
    print("all formulations match jax.vjp")


def time_probe():
    from ips_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import bench

    def timed(jitted, *args, n_warmup=2, n_iter=5):
        return bench._time_steps(lambda: jitted(*args), n_warmup, n_iter)

    def time_op(fn, *args):
        """Seconds per op via a scan over K DISTINCT stacked inputs.

        Loop-repeat with a perturbed-but-identical input is unreliable
        for these ops: conv is linear, so XLA:TPU can factor the
        perturbation out of the body and the measured time collapses to
        ~0 (observed). A scan over K different inputs leaves nothing to
        hoist, and every output is consumed (jnp.sum, fused into the
        conv epilogue) so nothing can be dead-code-eliminated or
        narrowed. The K=16 vs K=4 slope cancels dispatch cost and any
        per-call constant.
        """
        x0 = args[0]

        def many(xs, *consts):
            def body(c, xi):
                return (c + jnp.sum(fn(xi, *consts))
                        .astype(jnp.float32) * 1e-30, None)
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)[0]

        def stack(k):
            i = jnp.arange(k, dtype=jnp.float32)
            scale = (1.0 + i * 1e-3).astype(x0.dtype)
            return x0[None] * scale[(...,) + (None,) * x0.ndim]

        # K=64 vs 16: the 48-iteration slope (several ms of device work)
        # has to clear this backend's ~1 ms tunnel-timing jitter; the
        # first attempt's 16-vs-4 slope (12 iters of a ~0.1 ms op) did
        # not and produced 0-clamped cells.
        jitted = jax.jit(many)
        t_hi = timed(jitted, stack(64), *args[1:])
        t_lo = timed(jitted, stack(16), *args[1:])
        return max(t_hi - t_lo, 1e-9) / 48

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rows = {}
    for name, c in cases(jnp.bfloat16).items():
        x, w, dy = map(jax.device_put, (c["x"], c["w"], c["dy"]))
        stride, pad = c["stride"], c["pad"]
        H_in = c["x"].shape[1]

        ms_vjp = time_op(
            lambda dy_, x_, w_: vjp_input_grad(x_, w_, dy_, stride, pad),
            dy, x, w) * 1e3
        if stride == 1:
            ms_alt = time_op(
                lambda dy_, w_: explicit_s1_input_grad(w_, dy_, pad),
                dy, w) * 1e3
        else:
            ms_alt = time_op(
                lambda dy_, w_: phase_s2_input_grad(w_, dy_, H_in,
                                                    stride, pad),
                dy, w) * 1e3
        # the forward conv at the same shape = the floor the backward
        # is being compared against
        ms_fwd = time_op(
            lambda x_, w_: conv_fwd(x_, w_, stride, pad), x, w) * 1e3
        rows[name] = {"vjp_ms": ms_vjp, "alt_ms": ms_alt, "fwd_ms": ms_fwd}
        print(f"{name}: vjp {ms_vjp:.3f} ms, alt {ms_alt:.3f} ms, "
              f"fwd {ms_fwd:.3f} ms", flush=True)

    with open("results/dgrad_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/dgrad_probe.json")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--verify", action="store_true")
    a = p.parse_args()
    if a.verify:
        verify()
    else:
        time_probe()
