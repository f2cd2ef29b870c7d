"""On-chip A/B of extract_feat's feed + pipeline design.

Arms (same corpus, same jitted ResNet-50 encoder, same writer thread):
  legacy    — synchronous fp32 feed: host-normalized float tiles,
              blocking per-batch readback (the pre-round-4 loop shape,
              reference extract_feat.py:131-161's torch analogue)
  pipelined — uint8 feed normalized in-jit (4x fewer host->device
              bytes) + depth-1 async dispatch (next host tile read and
              previous feature readback overlap device compute)

Context rows: raw device_put wall for one uint8 vs fp32 batch (the
tunnel-bandwidth control — ratios are only comparable within a session,
CLAUDE.md), and the pure encode dispatch wall.

Writes results/extract_feat_probe.json. Run on TPU:
    python scripts/probe_extract_feat.py
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/probe_extract_corpus"
TILE = 256
BATCH = 64


def build_corpus():
    from ips_tpu.data.camelyon.foreground import compute_foreground
    from ips_tpu.data.camelyon.otsu import compute_thresholds
    from ips_tpu.data.camelyon.synth import generate_synth_camelyon

    if os.path.exists(CORPUS):
        shutil.rmtree(CORPUS)
    generate_synth_camelyon(CORPUS, n_normal=2, n_tumor=1, n_test=0,
                            height=8192, width=8192, seed=7)
    compute_thresholds(CORPUS, "otsu.csv", n_worker=1)
    coords_p, bounds_p = compute_foreground(
        CORPUS, "otsu.csv", os.path.join(CORPUS, "fg"), train=True,
        tile_size=TILE, fg_perc_thresh=0.05, n_worker=1)
    import pandas as pd
    n_tiles = len(pd.read_pickle(coords_p))
    print(f"corpus: 3 slides, {n_tiles} foreground tiles", flush=True)
    return coords_p, bounds_p, n_tiles


def time_arm(enc, label, coords_p, bounds_p, n_tiles):
    from ips_tpu.data.camelyon.extract_feat import extract_features

    out = os.path.join(CORPUS, f"feat_{label}.h5")
    walls = []
    for rep in range(3):  # rep 0 warms compile/cache paths
        t0 = time.perf_counter()
        extract_features(CORPUS, "otsu.csv", bounds_p, coords_p, out,
                         tile_size=TILE, batch_size=BATCH, encoder=enc)
        walls.append(time.perf_counter() - t0)
        print(f"{label} rep{rep}: {walls[-1]:.2f}s "
              f"({n_tiles / walls[-1]:.1f} tiles/s)", flush=True)
    best = min(walls[1:])
    return {"wall_s": best, "tiles_per_s": n_tiles / best,
            "walls_all": walls}


def bandwidth_control():
    """device_put wall for one encoder batch, uint8 vs fp32 feed."""
    import jax
    import jax.numpy as jnp

    from ips_tpu.utils.profiling import host_sync

    rows = {}
    for name, arr in [
            ("uint8", np.zeros((BATCH, 224, 224, 3), np.uint8)),
            ("fp32", np.zeros((BATCH, 224, 224, 3), np.float32))]:
        host_sync(jax.device_put(arr))  # warm
        t0 = time.perf_counter()
        for _ in range(4):
            host_sync(jax.device_put(arr))
        dt = (time.perf_counter() - t0) / 4
        rows[name] = {"put_ms": dt * 1e3,
                      "gbps": arr.nbytes / dt / 1e9}
    return rows


def main():
    from ips_tpu.data.camelyon.extract_feat import PipelinedJaxEncoder
    from ips_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    print("device:", jax.devices()[0].device_kind, flush=True)

    coords_p, bounds_p, n_tiles = build_corpus()
    enc = PipelinedJaxEncoder(enc_type="resnet50", batch_size=BATCH)

    res = {"n_tiles": n_tiles, "batch_size": BATCH,
           "device": jax.devices()[0].device_kind,
           "bandwidth_control": bandwidth_control()}

    enc.sync_fp32 = True
    res["legacy_sync_fp32"] = time_arm(enc, "legacy", coords_p, bounds_p,
                                       n_tiles)
    enc.sync_fp32 = False
    res["pipelined_uint8"] = time_arm(enc, "pipelined", coords_p, bounds_p,
                                      n_tiles)
    res["speedup"] = (res["pipelined_uint8"]["tiles_per_s"]
                      / res["legacy_sync_fp32"]["tiles_per_s"])

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "extract_feat_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: res[k] for k in
                      ["speedup", "bandwidth_control"]}, indent=2))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
