"""Minimal, self-contained Iterative Patch Selection example.

Parity with the reference's ips_example.ipynb (a Colab-ready minimal IPS
on small MNIST images): build a tiny synthetic patch-classification task,
run IPS selection + cross-attention aggregation, and overfit it in a few
hundred steps. Runs on CPU in ~2 minutes or on a TPU chip.

    python examples/minimal_ips.py [--steps 60] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# runnable from anywhere without installing: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_task(rng: np.random.Generator, n_samples: int, n_class: int,
              N: int, patch: int):
    """Images of N noise patches; one patch carries a class-coded stripe."""
    X = rng.normal(0, 0.1, (n_samples, N, patch, patch, 1)).astype(np.float32)
    y = np.arange(n_samples) % n_class
    for i, cls in enumerate(y):
        slot = rng.integers(0, N)
        pattern = np.zeros((patch, patch, 1), np.float32)
        pattern[cls::4] = 2.0
        X[i, slot] = pattern
    return X, y.astype(np.int64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ips_tpu.config import config_from_dict
    from ips_tpu.train.schedule import warmup_cosine_lr
    from ips_tpu.train.steps import IPSTrainer

    conf = config_from_dict(dict(
        n_epoch=1, B=8, B_seq=8, n_epoch_warmup=0.1, lr=3e-4, wd=0.01,
        n_class=4, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=1,
        N=25, M=5, I=5, patch_size=[32, 32], patch_stride=[32, 32],
        use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=256,
        compute_dtype="float32",
        tasks={"task0": {"id": 0, "name": "cls", "act_fn": "softmax",
                         "metric": "accuracy"}}))

    rng_np = np.random.default_rng(0)
    X, y = make_task(rng_np, 64, conf.n_class, conf.N, 32)

    trainer = IPSTrainer(conf)
    key = jax.random.PRNGKey(0)
    mask = jnp.ones((conf.B, conf.N), bool)
    weights = jnp.ones((conf.B,), jnp.float32)

    print(f"devices: {jax.devices()}")
    for step in range(a.steps):
        sel = rng_np.integers(0, len(X), conf.B)
        batch = jnp.asarray(X[sel])
        labels = {"cls": jnp.asarray(y[sel], jnp.int32)}
        lr = warmup_cosine_lr(step + 1, a.steps, 1, 0.1, conf.lr)
        loss, _, preds = trainer.fused_step(
            batch, mask, labels, weights, jax.random.fold_in(key, step), lr)
        if step % 10 == 0 or step == a.steps - 1:
            acc = float((jnp.argmax(preds["cls"], -1)
                         == labels["cls"]).mean())
            print(f"step {step:3d}  loss {float(loss):.4f}  "
                  f"batch acc {acc:.2f}")

    # Show which patches IPS picked for one image (the signal patch should
    # score highest once trained).
    _, _, mem_idx, _ = trainer.select(jnp.asarray(X[:1]), rng=key)
    print("selected patch indices for sample 0:", np.asarray(mem_idx)[0])


if __name__ == "__main__":
    main()
