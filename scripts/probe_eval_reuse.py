"""TPU probe: eval/inference embedding reuse (conf.eval_reuse_emb).

Selection already runs the encoder in eval mode, so the eval forward's
re-encode of the M survivors recomputes values the top-M buffer holds
(reference re-encodes: architecture/ips_net.py:264-283). This times the
fused select+eval step with the reuse on vs off at:

  * camelyon feature scale — B=16, N=10k, M=I=5000, 2048->512 projector,
    ln_fold (the shipped config): reuse drops the (B, 5000, 2048) patch
    gather AND the (B*5000) projector re-encode, ~1/3 of eval FLOPs
  * the mnist bench shape — B=16, N=900, M=I=100 conv encoder

Run ON TPU:  python scripts/probe_eval_reuse.py
Results land in results/eval_reuse_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, n_warmup=2, n_iter=6):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rows = {}
    rng = jax.random.PRNGKey(0)

    # -- camelyon feature scale ------------------------------------------
    B, N, M, I, D_FEAT = 16, 10_000, 5_000, 5_000, 2048
    cam = config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1, ln_fold=True,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    mask = jnp.ones((B, N), bool)
    labels = {"metastases": jnp.zeros((B, 1), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)

    for name, on in (("camelyon_eval_reuse_ms", True),
                     ("camelyon_eval_reencode_ms", False)):
        tr = IPSTrainer(cam.replace(eval_reuse_emb=on), init_opt=False)
        t = timeit(lambda: tr.fused_eval_step(feats, mask, labels, weights,
                                              rng))
        rows[name] = t * 1e3
        print(f"{name}: {t * 1e3:7.2f} ms", flush=True)

    # -- mnist bench shape -------------------------------------------------
    mconf = bench._conf("bfloat16", 16)
    patches, pmask, plabels, pweights = bench._batch(mconf, rng)
    patches = jax.device_put(patches)

    for name, on in (("mnist_eval_reuse_ms", True),
                     ("mnist_eval_reencode_ms", False)):
        tr = IPSTrainer(mconf.replace(eval_reuse_emb=on), init_opt=False)
        t = timeit(lambda: tr.fused_eval_step(patches, pmask, plabels,
                                              pweights, rng))
        rows[name] = t * 1e3
        print(f"{name}: {t * 1e3:7.2f} ms", flush=True)

    with open("results/eval_reuse_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/eval_reuse_probe.json")


if __name__ == "__main__":
    main()
