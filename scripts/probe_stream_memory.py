"""Compiled-HLO evidence that streaming selection memory is O(M+I), not O(N).

VERDICT round-3 item 4 asks for proof that the large-N image-mode path
keeps selection memory decoupled from N — the reference's core claim
(README.md:7, lazy mode ips_net.py:223) — by *compiled-HLO memory
analysis* rather than runtime peak-HBM (``device.memory_stats()`` is
None on this tunneled backend).

Method: AOT-lower and compile the two selection paths at the camelyon
large-N run config, then read ``compiled.memory_analysis()``:

  * streaming chunk step (`StreamingSelector._step`) — the jitted unit
    the lazy path dispatches per I-chunk. N does not appear in ANY of
    its argument shapes; arguments are (B, I, ...) chunk + (B, M, ...)
    buffer, so its argument/temp/output bytes are constants of (M, I)
    by construction. The analysis prints those constants.
  * eager fused select (`trainer.select`) at N in {2560, 10240} — the
    O(N) contrast: argument bytes grow linearly with N while temp stays
    bounded (the round-3 chunked pre-encode keeps the transient at one
    I-chunk of conv activations).

Run (CPU HLO analysis — scaling shape is backend-independent):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/probe_stream_memory.py
Results land in results/stream_memory_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

B, M, I = 4, 256, 256
TILE = (32, 32)


def make_conf(N):
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=True, enc_type="resnet18", n_res_blocks=2,
        n_chan_in=3, shuffle=False, n_token=1, N=N, M=M, I=I,
        use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=512,
        attn_dropout=0.1, dropout=0.1, patch_size=list(TILE),
        patch_stride=list(TILE), compute_dtype="float32",
        input_dtype="float32", mask_padding=True, eager=False,
        tasks={"task0": {"id": 0, "name": "metastases",
                         "act_fn": "sigmoid", "metric": "auc"}}))


def mem_dict(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        return {"unavailable": True}
    keys = ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "generated_code_size_in_bytes",
            "alias_size_in_bytes")
    return {k: int(getattr(ma, k)) for k in keys if hasattr(ma, k)}


def main():
    from ips_tpu.train.steps import IPSTrainer
    from ips_tpu.train.streaming import StreamingSelector

    rows = {}

    # --- streaming chunk step: N-free by construction -------------------
    conf = make_conf(10240)
    trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
    sel = StreamingSelector(trainer)
    D = conf.D
    args = (
        trainer.state.params, trainer.state.batch_stats,
        jax.ShapeDtypeStruct((B, M, D), jnp.float32),        # mem_emb
        jax.ShapeDtypeStruct((B, M), jnp.int32),             # mem_idx
        jax.ShapeDtypeStruct((B, M), jnp.bool_),             # mem_valid
        jax.ShapeDtypeStruct((B, I) + TILE + (3,), jnp.float32),  # chunk
        jax.ShapeDtypeStruct((B, I), jnp.int32),
        jax.ShapeDtypeStruct((B, I), jnp.bool_),
    )
    compiled = sel._step.lower(*args).compile()
    rows["streaming_chunk_step"] = mem_dict(compiled)
    shapes = [str(a.shape) if hasattr(a, "shape") else "params"
              for a in args[2:]]
    rows["streaming_chunk_step"]["device_arg_shapes"] = shapes
    print("streaming chunk step:", rows["streaming_chunk_step"], flush=True)

    # --- eager select at two N: the O(N) contrast ------------------------
    for N in (2560, 10240):
        conf_n = make_conf(N)
        tr = IPSTrainer(conf_n, rng=jax.random.PRNGKey(0))
        patches = jax.ShapeDtypeStruct((B, N) + TILE + (3,), jnp.float32)
        mask = jax.ShapeDtypeStruct((B, N), jnp.bool_)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        compiled = tr._select.lower(
            tr.state.params, tr.state.batch_stats, patches, mask,
            rng).compile()
        rows[f"eager_select_N{N}"] = mem_dict(compiled)
        print(f"eager select N={N}:", rows[f"eager_select_N{N}"],
              flush=True)

    s = rows["streaming_chunk_step"]
    if "temp_size_in_bytes" in s:
        e_lo = rows["eager_select_N2560"]
        e_hi = rows["eager_select_N10240"]
        rows["arg_bytes_ratio_eager_4x_N"] = (
            e_hi["argument_size_in_bytes"] / e_lo["argument_size_in_bytes"])
        ratio = rows["arg_bytes_ratio_eager_4x_N"]
        print(f"eager arg bytes scale {ratio:.2f}x for 4x N; "
              "streaming chunk step args are N-free", flush=True)

    with open("results/stream_memory_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/stream_memory_probe.json")


if __name__ == "__main__":
    main()
