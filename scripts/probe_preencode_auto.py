"""TPU probe: validate preencode_select='auto' end to end (round 3).

Checks the shipped fix for the large-N gather cliff on real hardware:

  * select at N=3600 through the REAL `IPSTrainer._select` (conf default
    'auto' -> resolves ON) must reproduce the ~90 ms the explicit
    preencode variant measured (results/largeN_probe.json), vs 147.7 off.
  * the camelyon feature-mode fused step (B=16, N=10k, M=I=5000,
    2048->512 projector) with 'auto' vs preencode_select=false — the
    10.6 ms/step of (B, 10k, 2048)-row gathers in the round-3 roofline
    should mostly disappear.
  * the N=900 bench shape must resolve OFF (bit-identical path to the
    round-2 headline; asserted, not timed).

Run ON TPU:  python scripts/probe_preencode_auto.py
Results land in results/preencode_auto_probe.json.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    rows = {}

    # -- resolution sanity at the bench shape -------------------------------
    conf900 = bench._conf("bfloat16", 16)
    tr900 = IPSTrainer(conf900)
    p900 = jax.ShapeDtypeStruct((16, 900, 50, 50, 1), jnp.bfloat16)
    assert tr900._resolve_preencode(p900) is False, "bench shape must stay off"
    rows["bench_shape_auto"] = False

    # -- select at N=3600 through the real trainer (auto on) ----------------
    conf = conf900.replace(N=3600)
    tr = IPSTrainer(conf)
    tr.state = tr900.state
    patches = jax.device_put(jax.random.uniform(
        rng, (16, 3600, 50, 50, 1), jnp.float32).astype(jnp.bfloat16))
    mask = jnp.ones((16, 3600), bool)
    assert tr._resolve_preencode(patches) is True
    sel = jax.jit(functools.partial(tr._select_impl, tr.state.params,
                                    tr.state.batch_stats))
    rows["select_3600_auto_ms"] = timeit(lambda: sel(patches, mask, rng)) * 1e3
    print(f"select_3600 auto: {rows['select_3600_auto_ms']:.1f} ms "
          f"(off was 147.7, explicit preenc 90.4)", flush=True)
    del patches

    # -- camelyon feature fused step: auto vs off ----------------------------
    from scripts.probe_camelyon import B, D_FEAT, I, M, N
    cam = dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=D_FEAT,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}})
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    fmask = jnp.ones((B, N), bool)
    labels = {"metastases": jnp.zeros((B, 1), jnp.float32)}
    weights = jnp.ones((B,), jnp.float32)

    for name, pe in (("off", False), ("auto", "auto")):
        trainer = IPSTrainer(config_from_dict({**cam,
                                               "preencode_select": pe}))
        t = timeit(lambda: trainer.fused_step(feats, fmask, labels, weights,
                                              rng, 3e-4)) * 1e3
        rows[f"camelyon_fused_{name}_ms"] = t
        print(f"camelyon fused ({name}): {t:.1f} ms/step", flush=True)
    rows["camelyon_speedup"] = (rows["camelyon_fused_off_ms"]
                                / rows["camelyon_fused_auto_ms"])

    with open("results/preencode_auto_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/preencode_auto_probe.json")


if __name__ == "__main__":
    main()
