"""TPU probe: gradient-half decomposition with in-jit repetition.

probe_train.py's standalone timings of small jits converge to a common
~5 ms value (fwd_eval 4.7, fwd_train 5.2, adamw 5.1) — the per-dispatch
floor of the remote tunnel, not device time. This probe repeats each
component K times inside one jit via `lax.fori_loop` with a
carry-perturbed input (so XLA cannot hoist the loop-invariant body) and
subtracts the K=0 dispatch cost, the same methodology as
probe_scorer.py.

Components at the bench config (B=16, M=100 memory batch, bf16):
  * enc_fwd     — encoder-only eval forward over the 1600 patches
                  (= one selection chunk's encode work)
  * fwd_eval    — full eval forward (encoder+transformer+heads+loss)
  * fwd_train   — train-mode forward (BN batch stats + dropout)
  * grad        — value_and_grad of the train-mode loss
  * grad_evalbn — value_and_grad with frozen BN / no dropout
  * adamw       — optimizer update alone

Run ON TPU:  python scripts/probe_train2.py
Results land in results/train_probe2.json.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

K_REP = 16


def _timed(jitted, *args, n_warmup=2, n_iter=3):
    import bench
    return bench._time_steps(lambda: jitted(*args), n_warmup, n_iter)


def time_op(fn, x, *consts):
    """Per-call seconds of fn(x, *consts), K_REP-repeated in one jit.

    Each iteration multiplies the floating leaves of x by
    (1 + carry*1e-30) — numerically an identity (rounds to 1.0) but
    structurally carry-dependent, so XLA cannot hoist the body out of
    the loop — and folds a 1e-30-scaled output sample back into the
    carry. The K=0 jit measures pure dispatch cost, which is subtracted
    (probe_scorer.py methodology).
    """

    def repeated(k, x, *consts):
        def body(_, carry):
            def perturb(a):
                if not jnp.issubdtype(a.dtype, jnp.floating):
                    return a
                scale = (jnp.ones((), a.dtype)
                         + jnp.asarray(carry, a.dtype)
                         * jnp.asarray(1e-30, a.dtype))
                return a * scale

            out = fn(jax.tree.map(perturb, x), *consts)
            # anchor EVERY floating output leaf into the carry: a dep on a
            # single element lets XLA dead-code-eliminate whole branches
            # (e.g. the entire backward pass of value_and_grad when only
            # the value is consumed)
            dep = sum(jnp.sum(leaf).astype(jnp.float32)
                      for leaf in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(leaf.dtype, jnp.floating))
            return carry + dep * 1e-30

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    t_k = _timed(jax.jit(functools.partial(repeated, K_REP)), x, *consts)
    t_0 = _timed(jax.jit(functools.partial(repeated, 0)), x, *consts)
    return max(t_k - t_0, 1e-9) / K_REP


def main():
    import bench
    from ips_tpu.models.ips_net import IPSModel
    from ips_tpu.train.steps import IPSTrainer, compute_task_losses

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    conf = bench._conf("bfloat16", 16)
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = bench._batch(conf, rng)
    patches = jax.device_put(patches)

    mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask, rng)
    mem_patch = jax.block_until_ready(mem_patch).astype(jnp.bfloat16)
    lr = jnp.asarray(1e-3, jnp.float32)
    state = trainer.state
    model = trainer.model
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rows = {}

    def report(name, sec):
        rows[name] = sec * 1e3
        print(f"{name:>12}: {sec * 1e3:7.2f} ms", flush=True)

    # encoder-only eval forward over the (B, M) = 1600-patch batch
    def enc_fwd(x):
        return model.apply(variables, x, train=False, method=IPSModel.encode)

    report("enc_fwd", time_op(enc_fwd, mem_patch))

    # full eval forward
    def fwd_eval(mp):
        return trainer._eval_impl(state.params, state.batch_stats, mp,
                                  mem_pos, mem_mask, labels, weights)

    report("fwd_eval", time_op(fwd_eval, mem_patch))

    # train-mode forward
    def fwd_train(mp):
        return trainer._loss_and_aux(state.params, state.batch_stats, mp,
                                     mem_pos, mem_mask, labels, weights,
                                     rng)

    report("fwd_train", time_op(fwd_train, mem_patch))

    # grads (train mode)
    gfn = jax.value_and_grad(trainer._loss_and_aux, has_aux=True)

    def grad(mp):
        (loss, _), grads = gfn(state.params, state.batch_stats, mp, mem_pos,
                               mem_mask, labels, weights, rng)
        return (loss, grads)

    report("grad", time_op(grad, mem_patch))

    # grads (eval-mode BN, no dropout)
    def loss_evalbn(params, mp):
        attn_mask = mem_mask if conf.mask_padding else None
        preds = model.apply({"params": params,
                             "batch_stats": state.batch_stats},
                            mp, mem_pos, attn_mask, train=False)
        return compute_task_losses(conf, preds, labels, weights)[0]

    gfn_eb = jax.value_and_grad(loss_evalbn, argnums=1)

    def grad_evalbn(mp):
        return gfn_eb(state.params, mp)

    report("grad_evalbn_x", time_op(grad_evalbn, mem_patch))

    gfn_eb_p = jax.value_and_grad(loss_evalbn, argnums=0)

    def grad_evalbn_p(mp):
        return gfn_eb_p(state.params, mp)

    report("grad_evalbn", time_op(grad_evalbn_p, mem_patch))

    # optimizer alone: the grads tree is the carry-perturbed input
    (_, _), grads0 = jax.jit(gfn)(state.params, state.batch_stats, mem_patch,
                                  mem_pos, mem_mask, labels, weights, rng)
    grads0 = jax.block_until_ready(grads0)

    def adamw(grads):
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = trainer.tx.update(grads, opt_state, state.params)
        return (optax.apply_updates(state.params, updates), new_opt)

    report("adamw", time_op(adamw, grads0))

    with open("results/train_probe2.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/train_probe2.json")


if __name__ == "__main__":
    main()
