"""On-chip validation of grad_encode_chunk: run a real e2e train step at an
M where the whole-batch gradient re-encode cannot fit HBM.

Companion to scripts/probe_grad_memory.py (compiled-HLO scaling evidence);
this script executes REAL steps on the TPU:

  * M=256 (shipped camelyon-e2e shape): step with knobs off vs
    grad_encode_chunk=64 — correctness smoke + per-step cost of the
    recompute (remat trades one extra encoder forward for the memory).
  * large M (default 1024 = 8192 tiles of 224x224 through resnet50-2block
    per step): chunked step runs; the off-knob variant is attempted last
    and expected to RESOURCE_EXHAUSTED (its compiled temp size exceeds
    HBM; see results/grad_memory_probe.json).

Run on the TPU (compiles go through the tunnel — enable the cache):
    python scripts/probe_grad_memory_chip.py [--skip-off-large]
Results land in results/grad_memory_chip.json.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B = 8
TILE = (224, 224)
M_LARGE = 1024


def make_conf(M, **over):
    from ips_tpu.config import config_from_dict
    base = dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=True, enc_type="resnet50", n_res_blocks=2,
        n_chan_in=3, shuffle=False, n_token=1, N=M, M=M, I=M,
        use_pos=False, H=8, D=512, D_k=64, D_v=64, D_inner=2048,
        attn_dropout=0.1, dropout=0.1, patch_size=list(TILE),
        patch_stride=list(TILE), compute_dtype="bfloat16",
        tasks={"task0": {"id": 0, "name": "metastases",
                         "act_fn": "sigmoid", "metric": "auc"}})
    base.update(over)
    return config_from_dict(base)


def run_steps(M, n_steps=3, **over):
    from ips_tpu.train.steps import IPSTrainer
    conf = make_conf(M, **over)
    trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
    ph, pw = TILE
    rng = np.random.default_rng(0)
    mem_patch = jnp.asarray(rng.integers(0, 256, (B, M, ph, pw, 3),
                                         dtype=np.uint8))
    mem_mask = jnp.ones((B, M), bool)
    labels = {"metastases": jnp.asarray(
        rng.integers(0, 2, (B, 1)).astype(np.float32))}
    weights = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(1)
    walls, losses = [], []
    for i in range(n_steps):
        t0 = time.perf_counter()
        loss, _, _ = trainer.train_step(mem_patch, None, mem_mask, labels,
                                        weights, key, 3e-4)
        loss = float(loss)  # host read = sync on this backend
        walls.append(time.perf_counter() - t0)
        losses.append(loss)
    assert np.isfinite(losses).all(), losses
    return {"losses": losses, "walls_s": [round(w, 3) for w in walls],
            "step_ms_last": round(walls[-1] * 1000, 1)}


def main():
    from ips_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    out = {"device": str(jax.devices()[0].device_kind),
           "shape": {"B": B, "tile": TILE, "enc": "resnet50/2-block",
                     "dtype": "bfloat16"}}

    for label, M, over in (
            ("M256_chunk64", 256, {"grad_encode_chunk": 64}),
            ("M256_chunk32", 256, {"grad_encode_chunk": 32}),
            (f"M{M_LARGE}_chunk64", M_LARGE, {"grad_encode_chunk": 64}),
            ("M256_off", 256, {})):
        print(f"== {label}", flush=True)
        try:
            out[label] = run_steps(M, **over)
        except Exception as e:  # RESOURCE_EXHAUSTED possible for 'off'
            out[label] = {"error": type(e).__name__,
                          "message": str(e)[:400]}
        print(label, json.dumps(out[label])[:500], flush=True)
        with open("results/grad_memory_chip.json", "w") as f:
            json.dump(out, f, indent=2)

    if "--skip-off-large" not in sys.argv:
        label = f"M{M_LARGE}_off"
        print(f"== {label} (expected to OOM)", flush=True)
        try:
            out[label] = run_steps(M_LARGE, n_steps=1)
        except Exception as e:  # RESOURCE_EXHAUSTED expected
            out[label] = {"error": type(e).__name__,
                          "message": str(e)[:400]}
        print(label, json.dumps(out[label])[:500], flush=True)

    with open("results/grad_memory_chip.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote results/grad_memory_chip.json")


if __name__ == "__main__":
    main()
