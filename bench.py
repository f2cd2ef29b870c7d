"""Benchmark: megapixel-MNIST flagship throughput on one chip.

Measures end-to-end training throughput (IPS selection over all N patches
+ gradient step) in patches/sec on the reference's headline configuration
(reference config/mnist_config.yml: B=16, N=900, M=I=100, 50x50 patches,
ResNet-18/2-block encoder, D=128, 4 tasks).

Two builds are timed:
  * baseline — a direct translation: fp32 compute, separate selection and
    train jits with a host round-trip between them (the structure of the
    reference training loop, training/iterative.py:103-189).
  * optimized — the TPU-native fast path: bf16 compute, fused
    selection+train in one jit, plus the 32-steps-per-dispatch variant
    (conf.steps_per_dispatch: one lax.scan dispatch runs 32 optimizer
    steps, amortizing per-dispatch overhead; measured K-sweep in
    results/ — 8/16/32 -> 31.1/30.4/29.8 ms/step); the headline takes
    the faster of the two.

A second tracked workload — the camelyon feature-mode fused multi-step at
reference scale (B=16, N=10k, 2048-dim, bf16, ln_fold, K=4) — is timed
over a device-resident pool and folded into the same JSON line as
camelyon_step_ms / camelyon_patches_per_sec (the driver contract is one
line), so a regression in the camelyon hot path is visible to the round
harness (VERDICT round-4 item 7).

Prints ONE JSON line; extra detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from ips_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _conf(compute_dtype: str, B: int):
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=4,
        N=900, M=100, I=100, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=True, H=8, D=128, D_k=16, D_v=16, D_inner=512,
        compute_dtype=compute_dtype, donate_buffers=True,
        input_dtype=("bfloat16" if compute_dtype == "bfloat16"
                     else "float32"),
        tasks={
            "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task1": {"id": 1, "name": "max", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task2": {"id": 2, "name": "top", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task3": {"id": 3, "name": "multi", "act_fn": "sigmoid",
                      "metric": "multilabel_accuracy"},
        }))


def _batch(conf, rng):
    B, N = conf.B, conf.N
    patches = jax.random.uniform(rng, (B, N, *conf.patch_size,
                                       conf.n_chan_in), jnp.float32)
    if conf.input_dtype == "bfloat16":
        # match the real pipeline: with input_dtype=bfloat16 the loader /
        # on-device densify ships bf16 patches (steps.py _densify_impl,
        # streaming _host_cast) — fp32 bench inputs would add an in-jit
        # cast the training path never pays (profiled at 0.57 ms/step)
        patches = patches.astype(jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    labels = {
        "majority": jnp.arange(B, dtype=jnp.int32) % conf.n_class,
        "max": jnp.arange(B, dtype=jnp.int32) % conf.n_class,
        "top": jnp.arange(B, dtype=jnp.int32) % conf.n_class,
        "multi": jnp.zeros((B, conf.n_class), jnp.float32),
    }
    weights = jnp.ones((B,), jnp.float32)
    return patches, mask, labels, weights


def _sync(out) -> None:
    from ips_tpu.utils.profiling import host_sync
    host_sync(out)


def _time_steps(fn, n_warmup: int, n_iter: int, n_groups: int = 3) -> float:
    """Median over groups of mean seconds per call (robust to one-off
    scheduler hiccups on the remote-attached device)."""
    import statistics
    for _ in range(n_warmup):
        _sync(fn())
    groups = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        _sync(out)
        groups.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(groups)


def bench_fused(conf, n_warmup=2, n_iter=8) -> float:
    from ips_tpu.train.steps import IPSTrainer
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = _batch(conf, rng)

    def step():
        return trainer.fused_step(patches, mask, labels, weights, rng, 1e-3)
    return _time_steps(step, n_warmup, n_iter)


def bench_fused_multi(conf, K=32, n_warmup=2, n_iter=2) -> float:
    """Seconds per optimizer step with K steps per device dispatch
    (conf.steps_per_dispatch in the training loop; fused_multi_step).
    Amortizes the ~5 ms per-dispatch overhead of the remote-attached chip
    (scripts/probe_fused_loop.py).

    K DISTINCT batches are stacked — a broadcast batch would let the
    scan's per-step input slices alias one buffer, which the real grouped
    loop (K distinct loader batches) never does — and the timing runs
    n_iter >= 2 dispatches per group so no single sample decides the
    headline."""
    from ips_tpu.train.steps import IPSTrainer
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = _batch(conf, rng)
    patches_k = jnp.stack(
        [_batch(conf, jax.random.fold_in(rng, k))[0] for k in range(K)])
    mask_k = jnp.broadcast_to(mask, (K,) + mask.shape)
    labels_k = {k: jnp.broadcast_to(v, (K,) + v.shape)
                for k, v in labels.items()}
    weights_k = jnp.broadcast_to(weights, (K,) + weights.shape)
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), 1e-3, jnp.float32)

    def step():
        losses, _, _ = trainer.fused_multi_step(patches_k, mask_k, labels_k,
                                                weights_k, rngs, lrs)
        return losses
    return _time_steps(step, n_warmup, n_iter) / K


def _conf_camelyon(K: int):
    """Reference camelyon feature scale (camelyon_config.yml: B=16,
    M=I=5000, 2048-dim projector, D=512) with the shipped TPU knobs
    (bf16, ln_fold). N=10k stands in for a large slide."""
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=1, B=16, B_seq=16, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=False, enc_type="resnet50", n_chan_in=2048,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=10_000, M=5_000, I=5_000, use_pos=False, H=8, D=512, D_k=64,
        D_v=64, D_inner=2048, attn_dropout=0.1, dropout=0.1, ln_fold=True,
        compute_dtype="bfloat16", donate_buffers=True, mask_padding=True,
        steps_per_dispatch=K,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))


def bench_camelyon_multi(K=4, n_warmup=2, n_iter=2) -> float:
    """Wall seconds per optimizer step of the camelyon feature-mode fused
    multi-step (K steps per dispatch, K distinct device-resident batches —
    the k-sweep construction from scripts/probe_wall_residual.py, so the
    number is compute + dispatch residual, not tunnel feed). Second
    tracked metric (VERDICT round-4 item 7): a regression in the camelyon
    hot path is visible to the round harness, not just the MNIST one."""
    from ips_tpu.train.steps import IPSTrainer
    conf = _conf_camelyon(K)
    trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(0)
    B, N, D_FEAT = conf.B, conf.N, conf.n_chan_in
    feats = jax.device_put(
        jax.random.normal(rng, (B, N, D_FEAT), jnp.bfloat16))
    scale = (1.0 + 0.001 * jnp.arange(K, dtype=jnp.float32)
             )[:, None, None, None].astype(jnp.bfloat16)
    feats_k = feats[None] * scale
    mask_k = jnp.ones((K, B, N), bool)
    labels_k = {"metastases": jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32) % 2, (K, B))}
    weights_k = jnp.broadcast_to(jnp.ones((B,), jnp.float32), (K, B))
    rngs = jax.random.split(rng, K)
    lrs = jnp.full((K,), 3e-4, jnp.float32)

    def step():
        losses, _, _ = trainer.fused_multi_step(feats_k, mask_k, labels_k,
                                                weights_k, rngs, lrs)
        return losses
    return _time_steps(step, n_warmup, n_iter) / K


def bench_split(conf, n_warmup=2, n_iter=4) -> float:
    from ips_tpu.train.steps import IPSTrainer
    trainer = IPSTrainer(conf)
    rng = jax.random.PRNGKey(0)
    patches, mask, labels, weights = _batch(conf, rng)

    def step():
        mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask, rng)
        # host round-trip between phases, as in the reference loop
        jax.block_until_ready(mem_patch)
        return trainer.train_step(mem_patch, mem_pos, mem_mask, labels,
                                  weights, rng, 1e-3)
    return _time_steps(step, n_warmup, n_iter)


BASELINE_FILE = "bench_baseline.json"


def main():
    B = 16
    print(f"benchmarking on {jax.devices()[0]}", file=sys.stderr, flush=True)

    # Optimized path first, so the headline number lands even if a
    # compile-heavy baseline measurement gets cut short.
    t_single = bench_fused(_conf("bfloat16", B))
    t_opt = t_single
    t_multi = None
    print(f"optimized (bf16, fused): {t_single * 1e3:.1f} ms/step",
          file=sys.stderr, flush=True)
    try:
        t_multi = bench_fused_multi(_conf("bfloat16", B))
        print(f"optimized (bf16, fused, 32 steps/dispatch): "
              f"{t_multi * 1e3:.1f} ms/step", file=sys.stderr, flush=True)
        t_opt = min(t_opt, t_multi)
    except Exception as e:  # noqa: BLE001 - keep the headline JSON alive
        print(f"multi-step measurement failed: {e}", file=sys.stderr)

    # Baseline: fp32 split-path. Measuring it costs two extra multi-minute
    # remote compiles, so reuse the recorded measurement when present;
    # --force-baseline re-measures.
    t_base = None
    have_recorded = False
    try:
        with open(BASELINE_FILE) as f:
            t_base = json.load(f)["baseline_sec_per_step"]
            have_recorded = True
            print(f"baseline (recorded): {t_base * 1e3:.1f} ms/step",
                  file=sys.stderr, flush=True)
    except (OSError, ValueError, KeyError):
        t_base = None   # missing/corrupt recording: fall through to measure
    if ("--force-baseline" in sys.argv
            or (not have_recorded and "--skip-baseline" not in sys.argv)):
        try:
            t_base = bench_split(_conf("float32", B))
            print(f"baseline (fp32, split): {t_base * 1e3:.1f} ms/step",
                  file=sys.stderr, flush=True)
            with open(BASELINE_FILE, "w") as f:
                json.dump({"baseline_sec_per_step": t_base, "B": B,
                           "N": 900}, f)
        except Exception as e:  # noqa: BLE001 - keep the headline JSON alive
            print(f"baseline measurement failed: {e}", file=sys.stderr)
    if t_base is None:
        t_base = t_opt  # no baseline available -> ratio 1.0

    # Second tracked metric: camelyon feature-mode fused step (the other
    # headline workload). Folded into the SAME JSON line — the driver
    # contract is one line — as camelyon_step_ms / camelyon_patches_per_sec.
    t_cam = None
    try:
        t_cam = bench_camelyon_multi()
        print(f"camelyon feature step (bf16, ln_fold, 4 steps/dispatch): "
              f"{t_cam * 1e3:.1f} ms/step", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 - keep the headline JSON alive
        print(f"camelyon measurement failed: {e}", file=sys.stderr)

    patches_per_sec = B * 900 / t_opt
    from ips_tpu.utils.profiling import device_peak_bytes
    peak = device_peak_bytes()
    if peak is not None:
        print(f"peak HBM: {peak / 1024**3:.2f} GiB", file=sys.stderr,
              flush=True)

    out = {
        "metric": "mnist_train_patches_per_sec",
        "value": round(patches_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(t_base / t_opt, 3),
        "single_step_ms": round(t_single * 1e3, 2),
    }
    if t_multi is not None:
        out["multi_step_ms"] = round(t_multi * 1e3, 2)
    if t_cam is not None:
        out["camelyon_step_ms"] = round(t_cam * 1e3, 2)
        out["camelyon_patches_per_sec"] = round(16 * 10_000 / t_cam, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
