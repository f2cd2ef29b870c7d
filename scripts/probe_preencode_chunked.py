"""TPU probe: chunked pre-encode for image-mode selection (round 3).

Image-mode preencode now builds the embedding table with a scan of
contiguous-slice encodes instead of one batched dispatch — required for
memory (a one-shot encode materializes conv activations for all B*N
patches: ~12.8 GB at camelyon-e2e scale) and expected FASTER too (the
chunked contiguous-slice encode floor at N=3600 was 69.6 ms vs the
one-shot preencode select's 91.0).

Measures through the REAL `IPSTrainer._select`:
  * select at N=3600 (mnist shape, bf16) — was 147.7 off / 91.0 one-shot
  * select at camelyon-e2e scale: B=8, N=10000, 50x50 uint8 tiles,
    M=I=1000 — the no-OOM proof at a scale the one-shot could not run

Run ON TPU:  python scripts/probe_preencode_chunked.py
Results land in results/preencode_chunked_probe.json.
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

    # -- mnist shape at N=3600 (auto preencode -> chunked for image mode) --
    conf = bench._conf("bfloat16", 16).replace(N=3600)
    tr = IPSTrainer(conf)
    patches = jax.device_put(jax.random.uniform(
        rng, (16, 3600, 50, 50, 1), jnp.float32).astype(jnp.bfloat16))
    mask = jnp.ones((16, 3600), bool)
    sel = jax.jit(functools.partial(tr._select_impl, tr.state.params,
                                    tr.state.batch_stats))
    rows["select_3600_chunked_ms"] = timeit(
        lambda: sel(patches, mask, rng)) * 1e3
    print(f"select_3600 (chunked preenc): "
          f"{rows['select_3600_chunked_ms']:.1f} ms "
          f"(one-shot preenc was 91.0, off 147.7, slice floor 69.6)",
          flush=True)
    del patches

    # -- camelyon-e2e scale, uint8 tiles ------------------------------------
    B2, N2, M2 = 8, 10_000, 1_000
    conf2 = config_from_dict(dict(
        n_epoch=1, B=B2, B_seq=B2, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=1, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=1,
        N=N2, M=M2, I=M2, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=256,
        compute_dtype="bfloat16", input_dtype="bfloat16",
        donate_buffers=False, mask_padding=True,
        tasks={"t": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                     "metric": "auc"}}))
    tr2 = IPSTrainer(conf2)
    tiles = jax.device_put(jax.random.randint(
        rng, (B2, N2, 50, 50, 1), 0, 255, jnp.uint8))
    mask2 = jnp.ones((B2, N2), bool)
    assert tr2._resolve_preencode(tiles) is True, "e2e scale must be auto-on"
    sel2 = jax.jit(functools.partial(tr2._select_impl, tr2.state.params,
                                     tr2.state.batch_stats))
    rows["select_e2e_10k_uint8_ms"] = timeit(
        lambda: sel2(tiles, mask2, rng), n_iter=3) * 1e3
    print(f"select e2e (B=8, N=10k uint8, chunked preenc): "
          f"{rows['select_e2e_10k_uint8_ms']:.1f} ms", flush=True)

    with open("results/preencode_chunked_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/preencode_chunked_probe.json")


if __name__ == "__main__":
    main()
