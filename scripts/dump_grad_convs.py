"""Inspect every convolution in the train-step gradient, by dtype/shape.

The fused-step roofline (RESULTS.md) shows backward convs running at
45-48 TF/s vs ~100 TF/s forward — suspiciously close to v5e's fp32 MXU
rate. This script answers the dtype question WITHOUT a TPU: it lowers
``value_and_grad`` of the train-mode loss (bench config, B=16, M=100,
bf16) to StableHLO and tabulates every ``stablehlo.convolution`` with
its operand element types, shapes, window, and estimated FLOPs.

Run on CPU:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/dump_grad_convs.py
"""

from __future__ import annotations

import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402


def _shape(t):
    """'tensor<1600x25x25x64xbf16>' -> ([1600,25,25,64], 'bf16')."""
    m = re.match(r"tensor<([0-9x]*)x?([a-z0-9]+)>", t)
    dims = [int(d) for d in m.group(1).split("x") if d] if m.group(1) else []
    return dims, m.group(2)


def conv_table(stablehlo_text):
    rows = []
    # one conv op can span lines; normalize whitespace first
    text = re.sub(r"\s+", " ", stablehlo_text)
    pat = re.compile(
        r"stablehlo\.convolution\(([^)]*)\)\s*"
        r"dim_numbers = \[([^\]]*)\]x\[([^\]]*)\]->\[([^\]]*)\],\s*"
        r"window = \{([^}]*)\}[^:]*:\s*"
        r"\(tensor<([^>]*)>, tensor<([^>]*)>\) -> tensor<([^>]*)>")
    for m in pat.finditer(text):
        lhs_dims, lhs_dt = _shape(f"tensor<{m.group(6)}>")
        rhs_dims, rhs_dt = _shape(f"tensor<{m.group(7)}>")
        out_dims, out_dt = _shape(f"tensor<{m.group(8)}>")
        kdims = m.group(3).split(", ")
        # kernel spatial dims are the numeric entries of dim_numbers
        spatial = [rhs_dims[i] for i, d in enumerate(kdims)
                   if d.strip() not in ("i", "o")]
        cin_idx = [i for i, d in enumerate(kdims) if d.strip() == "i"]
        cin = rhs_dims[cin_idx[0]] if cin_idx else 1
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        ksize = 1
        for s in spatial:
            ksize *= s
        gflop = 2.0 * out_elems * ksize * cin / 1e9
        rows.append({
            "lhs": (lhs_dims, lhs_dt), "rhs": (rhs_dims, rhs_dt),
            "out": (out_dims, out_dt), "window": m.group(5).strip(),
            "gflop": gflop,
        })
    return rows


def main():
    import bench
    from ips_tpu.train.steps import IPSTrainer

    conf = bench._conf("bfloat16", 16)
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf, rng)
    mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask, rng)
    mem_patch = mem_patch.astype(jnp.bfloat16)
    state = trainer.state

    gfn = jax.value_and_grad(trainer._loss_and_aux, has_aux=True)
    lowered = jax.jit(gfn).lower(state.params, state.batch_stats, mem_patch,
                                 mem_pos, mem_mask, labels, weights, rng)
    rows = conv_table(lowered.as_text())

    rows.sort(key=lambda r: -r["gflop"])
    total = {"bf16": 0.0, "f32": 0.0}
    print(f"{'GFLOP':>8}  {'dtypes (lhs*rhs->out)':>22}  lhs shape"
          f"{'':<16} rhs shape{'':<10} window")
    for r in rows:
        dt = f"{r['lhs'][1]}*{r['rhs'][1]}->{r['out'][1]}"
        key = "f32" if "f32" in (r["lhs"][1], r["rhs"][1]) else "bf16"
        total[key] += r["gflop"]
        print(f"{r['gflop']:8.2f}  {dt:>22}  {str(r['lhs'][0]):<25}"
              f" {str(r['rhs'][0]):<19} {r['window'][:60]}")
    print(f"\ntotal conv GFLOP: bf16 {total['bf16']:.1f}, "
          f"fp32-input {total['f32']:.1f}")


if __name__ == "__main__":
    main()
