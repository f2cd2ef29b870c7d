"""TPU probe: streaming-selection chunk grouping (stream_chunk_group).

The lazy path (`train/streaming.py`) issues one jitted dispatch plus
three `device_put`s PER I-chunk — at the large-N image scale that is
~50 chunks/batch, i.e. ~200 RPC issues per selection on a
remote-attached TPU where every issue costs ~3-5 ms (CLAUDE.md tunnel
cost model: count RPCs, not bytes). `stream_chunk_group=G` stacks G
consecutive chunks into one (G, B, I, ...) stage and lax.scans the
selection step over them: RPCs drop by G with identical results
(params are constant within one selection — unlike steps_per_dispatch
on the train path there is no staleness; equality regression-tested in
tests/test_streaming.py).

Two measurements at a camelyon image-mode lazy shape (B=4, N=4352
32x32x3 uint8 tiles, M=I=256, resnet50 2-block — 16 chunks, so G in
{1,4,8,16} all divide evenly):

  1. DEVICE-RESIDENT dispatch wall: all chunk triples (and their stacked
     groups) are pre-staged in HBM, then the per-chunk engine (G=1) and
     the scanned group engine race over the same 16-chunk schedule.
     Isolates the dispatch-issue amortization — the component that
     survives on a real TPU host (where the feed is local DMA, not this
     tunnel). Same construction as probe_wall_residual's pool.
  2. HOST-FED select_streaming() wall per G — the honest end-to-end
     number on THIS box, dominated by the tunnel's host->HBM bandwidth
     (the put_bw control row; grouping moves the same bytes in fewer
     RPCs, so expect little unless per-RPC cost dominates the session).

Run ON TPU:  python scripts/probe_stream_group.py
Results land in results/stream_group_probe.json.
"""

from __future__ import annotations

import json
import sys
import time

if "--small" in sys.argv:  # CPU smoke mode: API check, no tunnel compiles
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache

if "--small" not in sys.argv:
    enable_compilation_cache()
    B, N, M, I, TILE = 4, 4352, 256, 256, 32
    GROUPS = (1, 4, 8, 16)
    REPS = 3
else:
    B, N, M, I, TILE = 2, 40, 8, 8, 16
    GROUPS = (1, 2, 4)
    REPS = 1


def make_conf(G):
    from ips_tpu.config import config_from_dict
    return config_from_dict(dict(
        n_epoch=1, B=B, B_seq=B, n_epoch_warmup=1, lr=3e-4, wd=0.1,
        n_class=1, is_image=True, enc_type="resnet50", n_res_blocks=2,
        n_chan_in=3, shuffle=True, shuffle_style="batch", n_token=1,
        N=N, M=M, I=I, use_pos=False, H=8, D=512, D_k=64, D_v=64,
        D_inner=2048, attn_dropout=0.1, dropout=0.1, eager=False,
        patch_size=[TILE, TILE], patch_stride=[TILE, TILE],
        compute_dtype="bfloat16", input_dtype="bfloat16",
        donate_buffers=True, mask_padding=False, stream_chunk_group=G,
        tasks={"task0": {"id": 0, "name": "metastases",
                         "act_fn": "sigmoid", "metric": "auc"}}))


def main():
    from ips_tpu.train.steps import IPSTrainer

    print(f"probing on {jax.devices()[0]}", file=sys.stderr, flush=True)
    rows = {"B": B, "N": N, "M": M, "I": I,
            "n_chunks": (N - M + I - 1) // I}
    rng = jax.random.PRNGKey(0)

    # tunnel-weather control: host->HBM bandwidth this session
    host_buf = np.zeros((8, 1024, 1024), np.float16)  # 16 MB
    t0 = time.perf_counter()
    dev = jax.device_put(host_buf)
    jax.block_until_ready(dev)
    float(jnp.ravel(dev)[0])
    dt = time.perf_counter() - t0
    rows["put_bw_GBps"] = host_buf.nbytes / dt / 1e9
    print(f"host->device put: {host_buf.nbytes/1e6:.0f} MB in {dt:.2f}s "
          f"({rows['put_bw_GBps']:.3f} GB/s)", flush=True)
    del dev, host_buf

    # uint8 tiles, like the synthetic WSI corpus feeds the real lazy run
    patches = np.random.default_rng(0).integers(
        0, 255, (B, N, TILE, TILE, 3), np.uint8)
    n_chunks = rows["n_chunks"]

    # ---- (1) device-resident dispatch wall --------------------------------
    # Pre-stage every chunk triple (and stacked group) in HBM; race the
    # per-chunk engine against the scanned groups over the SAME schedule.
    from ips_tpu.train.streaming import StreamingSelector

    conf = make_conf(max(GROUPS))
    trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(1))
    sel = StreamingSelector(trainer)
    state = trainer.state
    rng8 = np.random.default_rng(1)
    chunk_np = [(rng8.integers(0, 255, (B, I, TILE, TILE, 3), np.uint8),
                 np.tile(np.arange(M + k * I, M + (k + 1) * I,
                                   dtype=np.int32), (B, 1)),
                 np.ones((B, I), bool)) for k in range(n_chunks)]
    chunks_dev = [tuple(sel._put(x) for x in c) for c in chunk_np]
    init_np = rng8.integers(0, 255, (B, M, TILE, TILE, 3), np.uint8)
    mem0 = jax.block_until_ready(
        sel._init(state.params, state.batch_stats, sel._put(init_np)))
    idx0 = sel._put(np.tile(np.arange(M, dtype=np.int32), (B, 1)))
    val0 = sel._put(np.ones((B, M), bool))

    gsel = {}
    for G in GROUPS[1:]:
        gsel[G] = StreamingSelector(
            IPSTrainer(make_conf(G), rng=jax.random.PRNGKey(1)))
    groups_dev = {}
    for G in GROUPS[1:]:
        groups_dev[G] = []
        for s in range(0, n_chunks - n_chunks % G, G):
            stack = tuple(np.stack([chunk_np[s + j][i] for j in range(G)])
                          for i in range(3))
            groups_dev[G].append(tuple(gsel[G]._put_group(x)
                                       for x in stack))

    def run_per_chunk():
        me, mi, mv = mem0, idx0, val0
        for c in chunks_dev:
            me, mi, mv = sel._step(state.params, state.batch_stats,
                                   me, mi, mv, *c)
        return mv

    def run_grouped(G):
        me, mi, mv = mem0, idx0, val0
        for g in groups_dev[G]:
            me, mi, mv = gsel[G]._gstep(state.params, state.batch_stats,
                                        me, mi, mv, *g)
        for c in chunks_dev[n_chunks - n_chunks % G:]:
            me, mi, mv = sel._step(state.params, state.batch_stats,
                                   me, mi, mv, *c)
        return mv

    def timed(fn, label):
        out = fn()
        jax.block_until_ready(out)
        float(jnp.sum(out))  # warm (compile) + sync via host read
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            float(jnp.sum(out))
            walls.append(time.perf_counter() - t0)
        med = float(np.median(walls))
        print(f"{label}: {med*1e3:.1f} ms /selection "
              f"({med*1e3/n_chunks:.2f} ms/chunk, "
              f"all: {[f'{w*1e3:.0f}' for w in walls]})", flush=True)
        return med

    rows["resident_g1_s"] = timed(run_per_chunk, "resident G=1")
    for G in GROUPS[1:]:
        rows[f"resident_g{G}_s"] = timed(lambda G=G: run_grouped(G),
                                         f"resident G={G}")
        rows[f"resident_g{G}_speedup"] = (rows["resident_g1_s"]
                                          / rows[f"resident_g{G}_s"])

    # ---- (2) host-fed end-to-end wall (tunnel-bound on this box) ----------
    for G in GROUPS:
        tr = trainer if G == max(GROUPS) else (
            gsel[G].trainer if G in gsel else
            IPSTrainer(make_conf(G), rng=jax.random.PRNGKey(1)))
        walls = []
        for r in range(max(REPS - 1, 1) + 1):
            t0 = time.perf_counter()
            out = tr.select_streaming(patches, rng=jax.random.PRNGKey(3 + r))
            jax.block_until_ready(out[0])
            float(jnp.sum(out[2]))
            walls.append(time.perf_counter() - t0)
        med = float(np.median(walls[1:]))  # walls[0] warms host paths
        rows[f"hostfed_g{G}_s"] = med
        print(f"host-fed G={G}: {med:.3f}s /selection", flush=True)
    base = rows.get("hostfed_g1_s")
    for G in GROUPS[1:]:
        if base and rows.get(f"hostfed_g{G}_s"):
            rows[f"hostfed_g{G}_speedup"] = base / rows[f"hostfed_g{G}_s"]

    with open("results/stream_group_probe.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows))
    print("wrote results/stream_group_probe.json")


if __name__ == "__main__":
    main()
