"""TPU probe: attribute the large-N selection slowdown (VERDICT r2 weak #1).

Round-2's N-sweep showed selection cost per 900 patches rising from
25.2 ms at N=900 to ~39 ms at N=3600-7200 (camelyon-e2e scale is N=10k),
waved off as "hotter HBM regions". This probe attributes it:

Per-chunk work in `ips_select` is encode (fixed shape) + score/top-k
(fixed M+I candidates) + the CHUNK GATHER from the resident (B, N, ...)
patch tensor. The only term whose cost can grow with N is the gather:
with shuffle=True the per-chunk `take_along_axis` reads I rows at
*random* offsets spread over an N-row table — the bigger the table, the
worse the HBM row locality. Everything else is N-invariant.

Isolation matrix, timed standalone (each variant is >= 50 ms at large N,
so the ~5 ms per-dispatch residual of the remote tunnel pollutes results
by <10%; the N=900 in-jit numbers are in results/select2_probe.json):

  enc_slice_N   — fori_loop over N/I chunk encodes taken as CONTIGUOUS
                  dynamic slices (best-case locality floor)
  enc_gather_N  — same encodes, chunks gathered by a random permutation
                  (the real shuffled access pattern, minus all selection
                  logic) -> the delta to enc_slice is pure gather-locality
  select_N      — the real `_select_impl` (shuffle on, the product path)
  select_noshuf_N — shuffle off: per-chunk gathers become contiguous
                  slices of the identity permutation
  [N=3600 only]
  select_preperm  — physically permute once, then contiguous slices
  select_I450     — chunk size I=450 (fewer, bigger chunks)
  select_preenc   — preencode_select: one (B, N) encode + row gathers

Also captures a jax.profiler trace of select at N=3600 and writes the
op-category breakdown via scripts/profile_fused.analyze.

Run ON TPU:  python scripts/probe_largeN.py
Results land in results/largeN_probe.json (+ largeN_select_breakdown.json).
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

TRACE_DIR = "/tmp/ips_largeN_trace"


def timeit(fn, n_warmup=2, n_iter=4):
    import bench
    return bench._time_steps(fn, n_warmup, n_iter)


def main():
    import bench
    from ips_tpu.models.ips_net import IPSModel
    from ips_tpu.ops.selection import ips_select
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    rows = {}

    def report(name, ms):
        rows[name] = ms
        print(f"{name:>24}: {ms:8.2f} ms", flush=True)

    base = bench._conf("bfloat16", 16)
    trainer0 = IPSTrainer(base)     # one weight set shared by all variants
    variables = {"params": trainer0.state.params,
                 "batch_stats": trainer0.state.batch_stats}
    I = base.I

    def encode(x):
        return trainer0.model.apply(variables, x, train=False,
                                    method=IPSModel.encode)

    for N in (900, 3600, 7200):
        conf = base.replace(N=N)
        patches = jax.device_put(jax.random.uniform(
            rng, (conf.B, N, *conf.patch_size, conf.n_chan_in),
            jnp.float32).astype(jnp.bfloat16))
        mask = jnp.ones((conf.B, N), bool)
        n_chunks = N // I
        perm = jax.device_put(jnp.stack(
            [jax.random.permutation(jax.random.fold_in(rng, b), N)
             for b in range(conf.B)]).astype(jnp.int32))

        @jax.jit
        def enc_slice(p, n_chunks=n_chunks):
            def body(k, acc):
                chunk = jax.lax.dynamic_slice_in_dim(p, k * I, I, axis=1)
                return acc + jnp.sum(encode(chunk).astype(jnp.float32))
            return jax.lax.fori_loop(0, n_chunks, body,
                                     jnp.zeros((), jnp.float32))

        @jax.jit
        def enc_gather(p, idx, n_chunks=n_chunks):
            def body(k, acc):
                ci = jax.lax.dynamic_slice_in_dim(idx, k * I, I, axis=1)
                chunk = jnp.take_along_axis(
                    p, ci.reshape(ci.shape + (1, 1, 1)), axis=1)
                return acc + jnp.sum(encode(chunk).astype(jnp.float32))
            return jax.lax.fori_loop(0, n_chunks, body,
                                     jnp.zeros((), jnp.float32))

        report(f"enc_slice_{N}", timeit(lambda: enc_slice(patches)) * 1e3)
        report(f"enc_gather_{N}",
               timeit(lambda: enc_gather(patches, perm)) * 1e3)

        for tag, overrides in (("", {}), ("_noshuf", {"shuffle": False})):
            tr = IPSTrainer(conf.replace(**overrides) if overrides else conf)
            tr.state = trainer0.state
            sel = jax.jit(functools.partial(
                tr._select_impl, tr.state.params, tr.state.batch_stats))
            report(f"select_{N}{tag}",
                   timeit(lambda sel=sel: sel(patches, mask, rng)) * 1e3)

        if N == 3600:
            # -- fix candidates, probed at the cliff scale ----------------
            enc_fn, score_fn = trainer0._enc_score_fns(
                trainer0.state.params, trainer0.state.batch_stats)
            from ips_tpu.models.transformer import pos_enc_1d_np
            pos = jnp.asarray(pos_enc_1d_np(conf.D, N))

            def var(name, **kw):
                @jax.jit
                def f(p, m, k):
                    r = ips_select(enc_fn, score_fn, p,
                                   M=conf.M, pos_table=pos, mask=m, rng=k,
                                   shuffle=True, shuffle_style="batch", **kw)
                    return r.mem_patch, r.mem_idx
                report(name, timeit(lambda: f(patches, mask, rng)) * 1e3)

            var("select_3600_preperm", I=I, prepermute=True)
            var("select_3600_I450", I=450)
            var("select_3600_preenc", I=I, preencode=True)

            # -- profiler trace of the real select at the cliff ------------
            tr = IPSTrainer(conf)
            tr.state = trainer0.state
            sel = jax.jit(functools.partial(
                tr._select_impl, tr.state.params, tr.state.batch_stats))

            def sync(out):
                float(jnp.ravel(out[2].astype(jnp.float32))[0])

            sync(sel(patches, mask, rng))
            sync(sel(patches, mask, rng))
            jax.profiler.start_trace(TRACE_DIR)
            for _ in range(2):
                out = sel(patches, mask, rng)
            sync(out)
            jax.profiler.stop_trace()
            from scripts.profile_fused import analyze
            try:
                analyze(TRACE_DIR, steps=2,
                        out_path="results/largeN_select_breakdown.json")
            except Exception as e:  # noqa: BLE001 - keep timings alive
                print(f"trace analysis failed: {e}", file=sys.stderr)

        del patches

    for N in (3600, 7200):
        for tag in ("", "_noshuf"):
            if f"select_{N}{tag}" in rows and f"select_900{tag}" in rows:
                rows[f"ratio_per_patch_{N}{tag}"] = (
                    rows[f"select_{N}{tag}"] / rows[f"select_900{tag}"]
                    / (N / 900))

    with open("results/largeN_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/largeN_probe.json")


if __name__ == "__main__":
    main()
