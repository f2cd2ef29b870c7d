"""TPU probe: where the gradient half of the fused step spends its time.

The fused step at the bench config (B=16, N=900, M=I=100, bf16) is
~34 ms: selection ~22 ms (at the encoder floor, RESULTS.md) and the
gradient step ~13.6 ms. A FLOP estimate puts the gradient step's
encoder work at ~3x the per-patch forward cost of selection
(B*M = 1600 patches, fwd+bwd) ≈ 7-8 ms, so this probe decomposes the
measured 13.6 ms at decision level:

  * fwd_eval    — eval-mode forward over the (B, M) memory batch
  * fwd_train   — train-mode forward (BN batch stats + dropout), no grad
  * grad        — value_and_grad of the train-mode loss (no optimizer)
  * grad_evalbn — value_and_grad of an eval-mode loss (frozen BN, no
                  dropout): isolates what train-mode BN/dropout add to
                  fwd+bwd
  * train_full  — the real `_train` jit (grad + AdamW update)
  * fused       — the full fused select+train step (context)

Each variant also reports XLA's own flop estimate
(compiled.cost_analysis()['flops']) so MFU claims are auditable.

Run ON TPU:  python scripts/probe_train.py
Results land in results/train_probe.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def host_sync(out):
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])


def timeit(fn, n_warmup=2, n_iter=10, n_groups=3):
    for _ in range(n_warmup):
        host_sync(fn())
    groups = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        host_sync(out)
        groups.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(groups)


def flops_of(jitted, *args, **kwargs):
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # cost analysis is best-effort on this backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan")


def main():
    import bench
    from ips_tpu.train.steps import IPSTrainer, TrainState

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = bench._conf("bfloat16", 16)
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf, rng)
    patches = jax.device_put(patches)

    # one selection pass to build the real (B, M) memory batch
    mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask, rng)
    mem_patch = jax.block_until_ready(mem_patch)
    lr = jnp.asarray(1e-3, jnp.float32)

    rows = {}

    # -- forward passes ------------------------------------------------
    fwd_eval = jax.jit(trainer._eval_impl)
    rows["fwd_eval"] = {
        "ms": timeit(lambda: fwd_eval(
            trainer.state.params, trainer.state.batch_stats, mem_patch,
            mem_pos, mem_mask, labels, weights)) * 1e3,
        "flops": flops_of(fwd_eval, trainer.state.params,
                          trainer.state.batch_stats, mem_patch, mem_pos,
                          mem_mask, labels, weights),
    }
    print(f"fwd_eval: {rows['fwd_eval']['ms']:.2f} ms", file=sys.stderr,
          flush=True)

    fwd_train = jax.jit(trainer._loss_and_aux)
    args_ft = (trainer.state.params, trainer.state.batch_stats, mem_patch,
               mem_pos, mem_mask, labels, weights, rng)
    rows["fwd_train"] = {
        "ms": timeit(lambda: fwd_train(*args_ft)[0]) * 1e3,
        "flops": flops_of(fwd_train, *args_ft),
    }
    print(f"fwd_train: {rows['fwd_train']['ms']:.2f} ms", file=sys.stderr,
          flush=True)

    # -- gradients, train-mode (the real loss) --------------------------
    grad = jax.jit(jax.value_and_grad(trainer._loss_and_aux, has_aux=True))
    rows["grad"] = {
        "ms": timeit(lambda: grad(*args_ft)[0][0]) * 1e3,
        "flops": flops_of(grad, *args_ft),
    }
    print(f"grad: {rows['grad']['ms']:.2f} ms", file=sys.stderr, flush=True)

    # -- gradients, eval-mode BN (frozen stats, no dropout) --------------
    def loss_evalbn(params, batch_stats, mem_patch, mem_pos, mem_mask,
                    labels, weights):
        from ips_tpu.train.steps import compute_task_losses
        attn_mask = mem_mask if conf.mask_padding else None
        preds = trainer.model.apply(
            {"params": params, "batch_stats": batch_stats},
            mem_patch, mem_pos, attn_mask, train=False)
        loss, _ = compute_task_losses(conf, preds, labels, weights)
        return loss

    grad_evalbn = jax.jit(jax.value_and_grad(loss_evalbn))
    args_eb = (trainer.state.params, trainer.state.batch_stats, mem_patch,
               mem_pos, mem_mask, labels, weights)
    rows["grad_evalbn"] = {
        "ms": timeit(lambda: grad_evalbn(*args_eb)[0]) * 1e3,
        "flops": flops_of(grad_evalbn, *args_eb),
    }
    print(f"grad_evalbn: {rows['grad_evalbn']['ms']:.2f} ms",
          file=sys.stderr, flush=True)

    # -- optimizer alone -------------------------------------------------
    (_, _), grads = grad(*args_ft)
    grads = jax.block_until_ready(grads)

    def adamw_only(grads, opt_state, params):
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = trainer.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    adamw = jax.jit(adamw_only)
    rows["adamw_only"] = {
        "ms": timeit(lambda: adamw(grads, trainer.state.opt_state,
                                   trainer.state.params)[0]) * 1e3,
        "flops": flops_of(adamw, grads, trainer.state.opt_state,
                          trainer.state.params),
    }
    print(f"adamw_only: {rows['adamw_only']['ms']:.2f} ms", file=sys.stderr,
          flush=True)

    # -- full train step (grad + AdamW), threading state -----------------
    train = jax.jit(trainer._train_impl)  # no donation: reusable inputs
    holder = {"state": trainer.state}

    def full_step():
        new_state, loss, _, _ = train(holder["state"], mem_patch, mem_pos,
                                      mem_mask, labels, weights, rng, lr)
        holder["state"] = new_state
        return loss

    rows["train_full"] = {
        "ms": timeit(full_step) * 1e3,
        "flops": flops_of(train, holder["state"], mem_patch, mem_pos,
                          mem_mask, labels, weights, rng, lr),
    }
    print(f"train_full: {rows['train_full']['ms']:.2f} ms", file=sys.stderr,
          flush=True)

    # -- fused step context ----------------------------------------------
    holder2 = {"state": trainer.state}
    fused = jax.jit(trainer._fused_impl)

    def fused_step():
        new_state, loss, _, _ = fused(holder2["state"], patches, mask,
                                      labels, weights, rng, lr)
        holder2["state"] = new_state
        return loss

    rows["fused"] = {
        "ms": timeit(fused_step, n_iter=8) * 1e3,
        "flops": flops_of(fused, holder2["state"], patches, mask, labels,
                          weights, rng, lr),
    }
    print(f"fused: {rows['fused']['ms']:.2f} ms", file=sys.stderr,
          flush=True)

    for name, r in rows.items():
        tf = r["flops"] / r["ms"] / 1e9 if r["flops"] == r["flops"] else None
        r["tflops_per_s"] = tf
        print(f"{name:>12}: {r['ms']:7.2f} ms"
              + (f"  {tf:6.1f} TF/s" if tf else ""))

    with open("results/train_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/train_probe.json")


if __name__ == "__main__":
    main()
