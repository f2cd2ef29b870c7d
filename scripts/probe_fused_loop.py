"""TPU probe: does batching K optimizer steps into ONE dispatch pay?

probe_select2.py found the real selection costs 17.1 ms in-jit while the
standalone fused step (32.75 ms) implies ~22.7 ms for the same work —
about 5 ms per dispatch that is either tunnel RPC latency or per-call
setup (e.g. conv-weight relayout) that a loop hoists. If the REAL fused
train step, state threaded through a `lax.fori_loop`, runs at ~28 ms per
step instead of ~33, then a `steps_per_dispatch` training knob recovers
~15% end-to-end throughput with unchanged semantics.

The loop threads the full TrainState as carry and perturbs the batch
with the previous loss (structural dependence, numerically ~identity),
so XLA cannot collapse the steps.

Run ON TPU:  python scripts/probe_fused_loop.py
Results land in results/fused_loop_probe.json.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

K = 8


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = bench._conf("bfloat16", 16)
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf, rng)
    patches = jax.device_put(patches.astype(jnp.bfloat16))
    lr = jnp.asarray(1e-3, jnp.float32)
    rows = {}

    # --- standalone fused step (one dispatch per step) -------------------
    holder = {"state": trainer.state}
    fused = jax.jit(trainer._fused_impl)

    def step():
        new_state, loss, _, _ = fused(holder["state"], patches, mask,
                                      labels, weights, rng, lr)
        holder["state"] = new_state
        return loss

    rows["fused_standalone"] = timeit(step) * 1e3
    print(f"fused_standalone: {rows['fused_standalone']:.2f} ms/step",
          flush=True)

    # --- K steps inside one jit via fori_loop ----------------------------
    def k_steps(state, patches):
        def body(i, carry):
            state, prev_loss = carry
            p = patches * (jnp.ones((), patches.dtype)
                           + jnp.asarray(prev_loss, patches.dtype) * 1e-30)
            r = jax.random.fold_in(rng, i)
            state, loss, _, _ = trainer._fused_impl(state, p, mask, labels,
                                                    weights, r, lr)
            return (state, loss)

        return jax.lax.fori_loop(
            0, K, body, (state, jnp.zeros((), jnp.float32)))

    kjit = jax.jit(k_steps)
    holder2 = {"state": trainer.state}

    def kstep():
        holder2["state"], loss = kjit(holder2["state"], patches)
        return loss

    rows["fused_k8_per_step"] = timeit(kstep, n_iter=2) * 1e3 / K
    print(f"fused_k8_per_step: {rows['fused_k8_per_step']:.2f} ms/step",
          flush=True)

    with open("results/fused_loop_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/fused_loop_probe.json")


if __name__ == "__main__":
    main()
