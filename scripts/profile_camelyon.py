"""TPU profile: op-level roofline of the camelyon FEATURE-mode fused step.

VERDICT r2 weak #2: the 17.7 ms/step camelyon feature number had no op
breakdown like results/fused_op_breakdown.json — whether the 2048->512
projector GEMMs and the (B, 10k, 2048) HBM streams sit at roofline was
unknown. This captures a jax.profiler trace of the K=4 multi-step
dispatch at reference scale (B=16 slides, N=10 000 feature rows, M=I=5000,
projector 2048->512, D=512, bf16) and aggregates per-category device
durations / achieved TF/s / GB/s via scripts/profile_fused.analyze.

Reference analog: the feature path it accelerates,
/root/reference/data/camelyon/camelyon_dataset.py:106-143 (B_seq=1
sequential in the reference, config/camelyon_config.yml:4-5).

Run ON TPU:  python scripts/profile_camelyon.py
Prints the category table; writes results/camelyon_op_breakdown.json.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

TRACE_DIR = "/tmp/ips_camelyon_trace"
K = 4
N_DISPATCH = 2


def main():
    from scripts.probe_camelyon import B, D_FEAT, I, M, N
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    print(f"profiling on {jax.devices()[0]}", file=sys.stderr, flush=True)
    ln_fold = "--ln-fold" in sys.argv
    conf = config_from_dict(dict(
        ln_fold=ln_fold,
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    mask_k = jnp.ones((K, B, N), bool)
    labels_k = {"metastases": jnp.zeros((K, B, 1), jnp.float32)}
    weights_k = jnp.ones((K, B), jnp.float32)
    # K distinct batches (bench-hygiene: aliased broadcast inputs would let
    # the scan's slices share one buffer — VERDICT r2 weak #6)
    feats_k = jnp.stack([feats * (1.0 + 0.001 * k) for k in range(K)])
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), 3e-4, jnp.float32)

    def step():
        losses, _, _ = trainer.fused_multi_step(feats_k, mask_k, labels_k,
                                                weights_k, rngs, lrs)
        return losses

    def sync(out):
        float(jnp.ravel(out)[0])

    sync(step())
    sync(step())
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(N_DISPATCH):
        out = step()
    sync(out)
    jax.profiler.stop_trace()
    print(f"trace captured under {TRACE_DIR}", file=sys.stderr, flush=True)

    from scripts.profile_fused import analyze
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    analyze(TRACE_DIR, steps=N_DISPATCH * K,
            out_path=f"results/camelyon_op_breakdown{suffix}.json")


if __name__ == "__main__":
    main()
