"""Compiled-HLO evidence for the gradient-side memory knobs.

The reference re-encodes all M selected patches in ONE train-mode conv
forward (reference architecture/ips_net.py:264-283); its backward keeps
every intermediate activation for B*M patches resident — the HBM binder
for image mode at large M. ips_tpu adds two knobs (ips_tpu/config.py):

  * ``remat_encode``      — jax.checkpoint around the gradient encode
                            (exact; backward recomputes the encoder)
  * ``grad_encode_chunk`` — lax.scan the gradient encode over (B, c, ...)
                            slices with rematerialized bodies: train
                            activation memory is O(one chunk), the
                            gradient-side analog of the selection
                            engine's chunked pre-encode (ghost-BN batch
                            statistics per chunk)

Method (same as scripts/probe_stream_memory.py, accepted for the
streaming O(M+I) claim): AOT-lower + compile the REAL train step
(IPSTrainer._train_impl) at the shipped camelyon-e2e image shape
(resnet50 2-block, 224x224 uint8 tiles, B=8) and read
``compiled.memory_analysis()``. ``temp_size_in_bytes`` is the
activation/workspace term the knobs target; arguments/outputs are the
same for all variants at a given M.

Run (CPU HLO analysis — the scaling shape is backend-independent):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/probe_grad_memory.py
Results land in results/grad_memory_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

B = 8
TILE = (224, 224)


def make_conf(M, **over):
    from ips_tpu.config import config_from_dict
    base = dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=True, enc_type="resnet50", n_res_blocks=2,
        n_chan_in=3, shuffle=False, n_token=1, N=M, M=M, I=M,
        use_pos=False, H=8, D=512, D_k=64, D_v=64, D_inner=2048,
        attn_dropout=0.1, dropout=0.1, patch_size=list(TILE),
        patch_stride=list(TILE), compute_dtype="bfloat16",
        donate_buffers=False,  # keep alias-free so temp bytes are comparable
        tasks={"task0": {"id": 0, "name": "metastases",
                         "act_fn": "sigmoid", "metric": "auc"}})
    base.update(over)
    return config_from_dict(base)


def mem_dict(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        return {"unavailable": True}
    keys = ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "generated_code_size_in_bytes",
            "alias_size_in_bytes")
    return {k: int(getattr(ma, k)) for k in keys if hasattr(ma, k)}


def train_step_mem(M, **over):
    from ips_tpu.train.steps import IPSTrainer
    conf = make_conf(M, **over)
    trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
    ph, pw = TILE
    sds = jax.ShapeDtypeStruct
    mem_patch = sds((B, M, ph, pw, 3), jnp.uint8)   # e2e tiles stay uint8
    mem_mask = sds((B, M), jnp.bool_)
    labels = {"metastases": sds((B, 1), jnp.float32)}
    weights = sds((B,), jnp.float32)
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(3e-4)
    compiled = jax.jit(trainer._train_impl).lower(
        trainer.state, mem_patch, None, mem_mask, labels, weights,
        rng, lr).compile()
    return mem_dict(compiled)


def main():
    rows = {}
    gib = 1024 ** 3

    # shipped e2e shape, all three variants
    for label, over in (
            ("M256_off", {}),
            ("M256_remat", {"remat_encode": True}),
            ("M256_chunk64", {"grad_encode_chunk": 64}),
            ("M256_chunk32", {"grad_encode_chunk": 32})):
        rows[label] = train_step_mem(256, **over)
        print(label, json.dumps(rows[label]), flush=True)

    # M scaling: off grows ~linearly in M, chunked stays ~flat + inputs
    for label, M, over in (
            ("M1024_off", 1024, {}),
            ("M1024_chunk64", 1024, {"grad_encode_chunk": 64})):
        rows[label] = train_step_mem(M, **over)
        print(label, json.dumps(rows[label]), flush=True)

    summary = {
        "temp_gib": {k: round(v.get("temp_size_in_bytes", 0) / gib, 3)
                     for k, v in rows.items()},
        "note": ("temp_size_in_bytes is the activation/workspace term; "
                 "arguments (params + uint8 tiles) are identical across "
                 "variants at a given M. CPU-backend HLO; the TPU "
                 "executable differs in layout/fusion but the knob's "
                 "O(M) -> O(chunk) scaling is structural."),
    }
    out = {"rows": rows, "summary": summary}
    with open("results/grad_memory_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
