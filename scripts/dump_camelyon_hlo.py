"""Dump the optimized HLO of the camelyon feature fused multi-step and
summarize the fusions named in results/camelyon_op_breakdown_auto2.json.

Identifies what each hot fusion actually computes (gather of what table,
convert of what buffer) so optimization effort goes to the right ops.

Run ON TPU: python scripts/dump_camelyon_hlo.py
Writes /tmp/camelyon_fused.hlo.txt and prints a summary.
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

K = 4


def main():
    from scripts.probe_camelyon import B, D_FEAT, I, M, N
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    conf = config_from_dict(dict(
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
    feats = jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16)
    mask_k = jnp.ones((K, B, N), bool)
    labels_k = {"metastases": jnp.zeros((K, B, 1), jnp.float32)}
    weights_k = jnp.ones((K, B), jnp.float32)
    feats_k = jnp.stack([feats * (1.0 + 0.001 * k) for k in range(K)])
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), 3e-4, jnp.float32)

    fn = trainer._jit_fused_multi()
    lowered = fn.lower(trainer.state, feats_k, mask_k, labels_k, weights_k,
                       rngs, lrs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/camelyon_fused.hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO written: {len(txt)} chars", flush=True)

    hot = ["fusion.398", "fusion.392", "fusion.391", "fusion.395",
           "fusion.396", "fusion.399", "dynamic-slice_convert_fusion.2",
           "add_maximum_fusion.5", "convert_reduce_fusion.6",
           "convert_reduce_fusion.7", "multiply_add_fusion.78",
           "fusion.423", "convert_add_fusion.5"]
    # map: fusion instruction line -> called computation name
    for name in hot:
        # find the instruction that defines this fusion
        m = re.search(rf"^\s*%?{re.escape(name)} = ([^\n]+)$", txt,
                      re.MULTILINE)
        if not m:
            print(f"\n=== {name}: NOT FOUND")
            continue
        line = m.group(1)
        print(f"\n=== {name}\n  {line[:400]}")
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            # grab the computation body
            bm = re.search(
                rf"^%?{re.escape(comp)} [^\n]*\{{(.*?)^\}}", txt,
                re.MULTILINE | re.DOTALL)
            if bm:
                body = bm.group(1)
                ops = [l.strip()[:240] for l in body.splitlines()
                       if re.search(r"= (bf16|f32|s32|pred|u32|s8)", l)]
                interesting = [o for o in ops if any(
                    k in o for k in ("gather", "convert", "dot", "scatter",
                                     "dynamic-slice", "reduce", "sort",
                                     "transpose", "iota", "copy"))]
                show = interesting if interesting else ops
                for o in show[:14]:
                    print(f"    {o}")
                if len(show) > 14:
                    print(f"    ... +{len(show) - 14} more")


if __name__ == "__main__":
    main()
