"""TPU probe: camelyon feature-step after the gather fixes + LN fold.

Round-3 continuation. HLO attribution (scripts/dump_camelyon_hlo.py) of
the 21.2 ms/step camelyon fused multi-step found three avoidable costs:

  * a 1.61 ms boolean gather building perm_valid   -> replaced by
    position < n_valid (exact; make_permutation is valid-first)
  * a 0.80 ms boolean gather in select_top_m       -> validity derived
    from the kept scores (invalid candidates score exactly NEG_INF)
  * a 4.0 ms fusion materializing an fp32 upcast of the whole
    (16, 10k, 2048) input slice for flax LayerNorm  -> ln_fold=True folds
    the LN row-affine through the projector GEMM (models/encoders.py)

This measures the fused single/multi step with the two gather fixes
(now unconditional — they are semantics-exact) and with/without ln_fold,
plus ln_fold selection fidelity (Jaccard of selected sets vs the exact
path at identical params/inputs).

Run ON TPU:  python scripts/probe_r3b.py
Results land in results/r3b_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, N, M, I, D_FEAT = 16, 10_000, 5_000, 5_000, 2048
K = 4


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def make_conf(**over):
    from ips_tpu.config import config_from_dict
    base = dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}})
    base.update(over)
    return config_from_dict(base)


def main():
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    mask = jnp.ones((B, N), bool)
    labels = {"metastases": jnp.zeros((B, 1), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)
    lr = 3e-4
    # K DISTINCT batches (input traffic must be honest)
    feats_k = jnp.stack([feats * (1.0 + 0.001 * k) for k in range(K)])
    mask_k = jnp.ones((K, B, N), bool)
    labels_k = {k: jnp.broadcast_to(v, (K,) + v.shape)
                for k, v in labels.items()}
    weights_k = jnp.broadcast_to(weights, (K,) + weights.shape)
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), lr, jnp.float32)

    rows = {}
    sel_idx = {}
    for tag, fold in (("gatherfix", False), ("fold", True)):
        trainer = IPSTrainer(make_conf(ln_fold=fold),
                             rng=jax.random.PRNGKey(1))

        def fused():
            loss, _, _ = trainer.fused_step(feats, mask, labels, weights,
                                            rng, lr)
            return loss

        rows[f"fused_ms_{tag}"] = timeit(fused) * 1e3
        print(f"fused single [{tag}]: {rows[f'fused_ms_{tag}']:.1f} ms",
              flush=True)

        def multi():
            losses, _, _ = trainer.fused_multi_step(
                feats_k, mask_k, labels_k, weights_k, rngs, lrs)
            return losses

        rows[f"multi_k4_ms_{tag}"] = timeit(multi, n_iter=2) * 1e3 / K
        print(f"multi_k4 [{tag}]: {rows[f'multi_k4_ms_{tag}']:.1f} ms/step",
              flush=True)

        # selection set for fidelity (same params/input both trainers:
        # same init rng, fold shares the param tree)
        _, _, mem_idx, _ = trainer.select(feats, mask, rng)
        sel_idx[tag] = np.asarray(mem_idx)

    # ln_fold selection fidelity
    jac = []
    for b in range(B):
        a = set(sel_idx["gatherfix"][b].tolist())
        c = set(sel_idx["fold"][b].tolist())
        jac.append(len(a & c) / len(a | c))
    rows["fold_selection_jaccard_mean"] = float(np.mean(jac))
    rows["fold_selection_jaccard_min"] = float(np.min(jac))
    print(f"ln_fold selection Jaccard: mean {rows['fold_selection_jaccard_mean']:.4f} "
          f"min {rows['fold_selection_jaccard_min']:.4f}", flush=True)

    with open("results/r3b_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/r3b_probe.json")


if __name__ == "__main__":
    main()
