"""TPU probe: one-hot-matmul permutation as a large-N gather replacement.

The round-3 attribution showed the large-N selection cost is the
per-chunk patch gather (10 GB/s effective once the table leaves VMEM),
and that a physical prepermute doesn't help because take_along_axis pays
the same per-row cost once. This probes routing the permutation through
the MXU instead: with shuffle_style='batch' the permutation is SHARED
across instances, so permuting is one (N, N) one-hot matmul applied to
the (N, B*patch) flattened table — dense, contiguous, MXU work
(~1 TFLOP bf16 at N=3600 vs 288 MB gathered at 10 GB/s). If
onehot_permute + contiguous-slice encodes beats the auto-preencode 91 ms,
it becomes a selection option for batch-style shuffle.

Run ON TPU:  python scripts/probe_onehot.py
Results land in results/onehot_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, B, I = 3600, 16, 100


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.models.ips_net import IPSModel
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = bench._conf("bfloat16", B).replace(N=N)
    trainer = IPSTrainer(conf)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    rng = jax.random.PRNGKey(0)
    patches = jax.device_put(jax.random.uniform(
        rng, (B, N, 50, 50, 1), jnp.float32).astype(jnp.bfloat16))
    perm = jax.random.permutation(rng, N).astype(jnp.int32)
    rows = {}

    def encode(x):
        return trainer.model.apply(variables, x, train=False,
                                   method=IPSModel.encode)

    @jax.jit
    def onehot_permute(p, perm):
        oh = jax.nn.one_hot(perm, N, dtype=jnp.bfloat16)      # (N, N)
        flat = p.reshape(B, N, -1)
        out = jnp.einsum("mn,bnp->bmp", oh, flat)
        return out.reshape(p.shape) + 0  # anchor

    rows["onehot_permute_ms"] = timeit(
        lambda: onehot_permute(patches, perm)) * 1e3
    print(f"one-hot permute (N={N}): {rows['onehot_permute_ms']:.1f} ms",
          flush=True)

    @jax.jit
    def permute_then_slices(p, perm):
        seq = onehot_permute(p, perm)

        def body(k, acc):
            chunk = jax.lax.dynamic_slice_in_dim(seq, k * I, I, axis=1)
            return acc + jnp.sum(encode(chunk).astype(jnp.float32))

        return jax.lax.fori_loop(0, N // I, body, jnp.zeros((), jnp.float32))

    rows["onehot_plus_slices_ms"] = timeit(
        lambda: permute_then_slices(patches, perm)) * 1e3
    print(f"one-hot permute + slice encodes: "
          f"{rows['onehot_plus_slices_ms']:.1f} ms "
          f"(gathered encodes were 141.2, preencode-auto select 91.0)",
          flush=True)

    with open("results/onehot_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/onehot_probe.json")


if __name__ == "__main__":
    main()
