"""TPU profile: op-level breakdown of the fused (multi-)step.

Captures a jax.profiler trace of the K=8 multi-step dispatch and
aggregates device-stream op durations from the Perfetto trace JSON, so
the per-step time is attributed to named XLA ops (convs, fusions,
copies/relayouts, scan overhead) without needing TensorBoard.

Findings (RESULTS.md "Op-level roofline"): leaf ops sum to exactly the
30.7 ms/step module time — convolution fusions 20.4 ms (66%, 86 TF/s =
44% MFU incl. backward), ~6 ms of elementwise/output fusions running at
820-850 GB/s (the HBM roofline), ~2.7 ms of data-formatting/layout
copies (the only ops below both rooflines), and <1 ms of everything
else (top-k 0.03 ms). This closes the gap between the component probes
(which hoisted per-step prep as compile-time constants) and the honest
multi-step floor.

Run ON TPU:  python scripts/profile_fused.py
Prints the top ops; writes results/fused_op_breakdown.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

TRACE_DIR = "/tmp/ips_fused_trace"
K = 8
N_DISPATCH = 2


def capture():
    import bench
    from ips_tpu.train.steps import IPSTrainer

    conf = bench._conf("bfloat16", 16)
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf, rng)
    patches_k = jnp.broadcast_to(patches, (K,) + patches.shape)
    mask_k = jnp.broadcast_to(mask, (K,) + mask.shape)
    labels_k = {k: jnp.broadcast_to(v, (K,) + v.shape)
                for k, v in labels.items()}
    weights_k = jnp.broadcast_to(weights, (K,) + weights.shape)
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), 1e-3, jnp.float32)

    def step():
        losses, _, _ = trainer.fused_multi_step(patches_k, mask_k, labels_k,
                                                weights_k, rngs, lrs)
        return losses

    def sync(out):
        # host value read: block_until_ready can return early on the
        # remote axon backend (CLAUDE.md); a truncated trace would
        # underreport per-step op times
        float(jnp.ravel(out)[0])

    sync(step())          # compile + warm
    sync(step())
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(N_DISPATCH):
        out = step()
    sync(out)
    jax.profiler.stop_trace()
    print(f"trace captured under {TRACE_DIR}", file=sys.stderr, flush=True)


def find_trace(trace_dir=TRACE_DIR):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        paths = glob.glob(os.path.join(trace_dir, "**", "trace.json.gz"),
                          recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}; "
                                f"files: {glob.glob(trace_dir + '/**', recursive=True)[:20]}")
    return max(paths, key=os.path.getmtime)


def analyze(trace_dir=TRACE_DIR, steps=N_DISPATCH * K,
            out_path="results/fused_op_breakdown.json"):
    path = find_trace(trace_dir)
    print(f"parsing {path}", file=sys.stderr, flush=True)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # The XLA Ops device track carries one event per op occurrence with
    # exact metadata: hlo_category, device_duration_ps, model_flops,
    # bytes_accessed. 'while' events are wrappers that also contain their
    # body ops (which appear as separate events), so they are excluded;
    # the remaining leaf ops sum to exactly the module wall time
    # (validated: leaf sum == interval union of the track).
    pid_names = {}
    tid_names = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    op_tracks = {k for k, n in tid_names.items() if n == "XLA Ops"}

    cat = defaultdict(lambda: [0.0, 0.0, 0.0, 0])   # t, flops, bytes, n
    ops = defaultdict(lambda: [0.0, ""])
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        if c == "while":
            continue
        t = float(a.get("device_duration_ps", e["dur"] * 1e6)) / 1e12
        row = cat[c]
        row[0] += t
        row[1] += float(a.get("model_flops", 0) or 0)
        row[2] += float(a.get("bytes_accessed", 0) or 0)
        row[3] += 1
        o = ops[e.get("name", "?")]
        o[0] += t
        o[1] = c

    total = sum(r[0] for r in cat.values())
    print(f"\nleaf device time: {total * 1e3:.1f} ms over "
          f"{steps} steps = {total / steps * 1e3:.2f} ms/step\n")
    print(f"{'category':>24} {'ms/step':>8} {'share':>6} {'TF/s':>7} "
          f"{'GB/s':>7}")
    out = {"per_step_ms": total / steps * 1e3, "by_category": {},
           "top_ops": {}}
    for c, (t, fl, by, n) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        if t / total < 0.002:
            continue
        tf = fl / t / 1e12 if t else 0.0
        gb = by / t / 1e9 if t else 0.0
        out["by_category"][c] = {"ms_per_step": t / steps * 1e3,
                                 "tflops_per_s": tf, "gb_per_s": gb}
        print(f"{c:>24} {t / steps * 1e3:8.2f} {t / total:6.1%} "
              f"{tf:7.1f} {gb:7.0f}")
    print("\n== top 20 ops (ms per step) ==")
    for name, (t, c) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:20]:
        out["top_ops"][name[:100]] = {"ms_per_step": t / steps * 1e3,
                                      "category": c}
        print(f"{t / steps * 1e3:8.3f}  [{c}] {name[:90]}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return out


def main():
    if "--analyze-only" not in sys.argv:
        capture()
    analyze()


if __name__ == "__main__":
    main()
