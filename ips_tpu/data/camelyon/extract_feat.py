"""Offline CLI 3/3: stream WSI tiles through an encoder -> per-slide HDF5.

Parity with reference data/camelyon/extract_feat.py:17-174, TPU-native:
the reference drags slide-contiguous batches through a torch DataLoader
with FILL/SLIDE_END sentinel tokens (reference camelyon_dataset.py:12-48)
because its sampler is index-based; here slides are simply iterated in
order and tiles batched with tail padding, so no sentinel machinery is
needed. The encoder is a jitted JAX ResNet-50 (4 blocks, 2048-d output —
the dims of the reference's BYOL checkpoint encoder) with optional local
weights; the reference's ``pretraining.model.byol_model`` module is an
external dependency not present in its repo either
(reference extract_feat.py:10, README.md:39).

Feed discipline (TPU-native; CLAUDE.md tunnel cost model — count RPCs
AND bytes): tiles ship to the device as **uint8** (4x fewer bytes than
an fp32 feed) and are normalized in-jit (``x.astype(f32)/255`` — bit-
identical to host-side fp32 division); encoder dispatch is **async**
(depth-1 pipeline: the next batch's host tile read and the previous
batch's feature readback overlap device compute), and the per-slide
gzip HDF5 write runs on a **writer thread** so compression never idles
the device. Measured on chip: scripts/probe_extract_feat.py.

Output: HDF5 groups per slide with datasets ``img`` (N, 2048) and ``pos``
(N,), group attr ``label``, gzip-compressed — byte-compatible with the
reference's file (reference extract_feat.py:164-171), so features
extracted by either pipeline train in either framework.

Usage: python -m ips_tpu.data.camelyon.extract_feat [--train|--test] ... \
           data_dir otsu_fname bounds_pkl coords_pkl feat_save_path
"""

from __future__ import annotations

import argparse
import queue
import threading
from typing import Callable, Optional

import numpy as np

TILE_CROP = 224  # center crop of the 256-tile (reference extract_feat.py:64)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = max(0, (h - size) // 2)
    x0 = max(0, (w - size) // 2)
    return img[y0:y0 + size, x0:x0 + size]


class _SyncEncoder:
    """Adapt a plain callable ``(B, H, W, 3) float in [0,1] -> (B, D)``
    to the dispatch/fetch pipeline API (eager: no overlap)."""

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray]):
        self._fn = fn

    def dispatch(self, tiles_u8: np.ndarray):
        return self._fn(tiles_u8.astype(np.float32) / 255.0)

    def fetch(self, handle) -> np.ndarray:
        return np.asarray(handle)


class PipelinedJaxEncoder:
    """Jitted eval-mode ResNet encoder with an async dispatch/fetch API.

    ``dispatch`` feeds a uint8 tile batch and returns an unfetched device
    handle; ``fetch`` blocks for the (B, D) fp32 features. Normalization
    happens in-jit so the host->device transfer is uint8. ``sync_fp32``
    selects the legacy synchronous host-normalized fp32 feed (kept as
    the A/B probe arm, scripts/probe_extract_feat.py).
    """

    def __init__(self, enc_type: str = "resnet50", pretrained_path: str = "",
                 batch_size: int = 64, sync_fp32: bool = False):
        import jax
        import jax.numpy as jnp

        from ips_tpu.models.encoders import ConvPatchEncoder
        from ips_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        model = ConvPatchEncoder(enc_type=enc_type, n_chan_in=3,
                                 n_res_blocks=4, dtype=jnp.bfloat16)
        x0 = jnp.zeros((1, TILE_CROP, TILE_CROP, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        if pretrained_path:
            from ips_tpu.models.pretrained import load_encoder_npz
            variables = load_encoder_npz(pretrained_path, variables)

        self.batch_size = batch_size
        self.sync_fp32 = sync_fp32
        self._jnp = jnp

        @jax.jit
        def fwd_u8(x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            return model.apply(variables, x, train=False)

        @jax.jit
        def fwd_f32(x):
            return model.apply(variables, x, train=False)

        self._fwd_u8, self._fwd_f32 = fwd_u8, fwd_f32

    def _pad(self, batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        if n < self.batch_size:  # pad tail batch to keep one compiled shape
            batch = np.concatenate(
                [batch, np.zeros((self.batch_size - n,) + batch.shape[1:],
                                 batch.dtype)])
        return batch

    def dispatch(self, tiles_u8: np.ndarray):
        n = tiles_u8.shape[0]
        if self.sync_fp32:  # legacy arm: host normalize, blocking readback
            x = self._pad(tiles_u8).astype(np.float32) / 255.0
            return np.asarray(self._fwd_f32(self._jnp.asarray(x)))[:n]
        return self._fwd_u8(self._jnp.asarray(self._pad(tiles_u8))), n

    def fetch(self, handle) -> np.ndarray:
        if isinstance(handle, np.ndarray):
            return handle
        out, n = handle
        return np.asarray(out)[:n]

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        """Synchronous convenience: float [0,1] or uint8 batch -> features."""
        if batch.dtype != np.uint8:
            batch = np.clip(batch * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return self.fetch(self.dispatch(batch))


def make_jax_encoder(enc_type: str = "resnet50",
                     pretrained_path: str = "",
                     batch_size: int = 64) -> PipelinedJaxEncoder:
    """Build the default jitted ResNet encoder (pipeline API + callable)."""
    return PipelinedJaxEncoder(enc_type=enc_type,
                               pretrained_path=pretrained_path,
                               batch_size=batch_size)


def extract_features(data_dir: str, otsu_fname: str, bounds_pkl: str,
                     coords_pkl: str, feat_save_path: str, *,
                     lvl: int = 0, tile_size: int = 256,
                     batch_size: int = 64,
                     encoder: Optional[Callable] = None) -> str:
    import h5py
    import pandas as pd

    from ips_tpu.data.camelyon.slide import SlideManager

    bounds = pd.read_pickle(bounds_pkl)
    coords = pd.read_pickle(coords_pkl)
    slide_man = SlideManager(data_dir=data_dir, otsu_fname=otsu_fname)
    enc = encoder or make_jax_encoder(batch_size=batch_size)
    if not hasattr(enc, "dispatch"):  # plain callable -> eager adapter
        enc = _SyncEncoder(enc)

    # Writer thread: gzip compression of finished slides overlaps the
    # next slide's device work. Bounded queue caps feature residency;
    # on a writer error the queue is drained so the producer never
    # blocks, and the error re-raises on the main thread.
    wq: "queue.Queue" = queue.Queue(maxsize=2)
    werr: list = []

    def _writer():
        try:
            with h5py.File(feat_save_path, "w") as h5:
                n_done = 0
                while True:
                    item = wq.get()
                    if item is None:
                        return
                    name, label, feats_np, pos_np = item
                    grp = h5.create_group(name)
                    grp.create_dataset("img", data=feats_np,
                                       compression="gzip",
                                       compression_opts=9)
                    grp.create_dataset("pos", data=pos_np,
                                       compression="gzip",
                                       compression_opts=9)
                    grp.attrs["label"] = label
                    n_done += 1
                    print("Nr. slides processed: ", n_done, flush=True)
        except Exception as e:  # noqa: BLE001 - re-raised on main thread
            werr.append(e)
            while wq.get() is not None:
                pass

    wt = threading.Thread(target=_writer, daemon=True)
    wt.start()

    y0 = max(0, (tile_size - TILE_CROP) // 2)
    try:
        for row in bounds.itertuples():
            slide = slide_man.get_slide(row.name)
            rows = coords.iloc[row.start_id:row.end_id + 1]
            xy = rows[["x", "y"]].to_numpy()
            pos_np = rows["pos_id"].to_numpy().astype(np.int64)
            feats, pending = [], None
            # depth-1 pipeline: batched host tile read + previous-batch
            # feature readback overlap the device encode of this batch
            for s in range(0, len(xy), batch_size):
                tiles = slide.read_tiles(xy[s:s + batch_size], lvl,
                                         (tile_size, tile_size))
                tiles = tiles[:, y0:y0 + TILE_CROP, y0:y0 + TILE_CROP]
                handle = enc.dispatch(tiles)
                if pending is not None:
                    feats.append(enc.fetch(pending))
                pending = handle
            if pending is not None:
                feats.append(enc.fetch(pending))
            slide.close()

            features_np = (np.concatenate(feats, axis=0) if feats
                           else np.zeros((0, 2048), np.float32))
            if werr:
                break
            wq.put((row.name, int(slide.has_tumor), features_np, pos_np))
    finally:
        wq.put(None)
        wt.join()
    if werr:
        raise werr[0]
    print("Stored features successfully!")
    return feat_save_path


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Extract tile features into per-slide HDF5 groups")
    p.add_argument("--lvl", type=int, default=0)
    p.add_argument("--tile_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--pretrained_path", default="",
                   help="local .npz with converted encoder weights")
    p.add_argument("data_dir")
    p.add_argument("otsu_fname")
    p.add_argument("bounds_pkl")
    p.add_argument("coords_pkl")
    p.add_argument("feat_save_path")
    a = p.parse_args(argv)
    enc = make_jax_encoder(pretrained_path=a.pretrained_path,
                           batch_size=a.batch_size)
    extract_features(a.data_dir, a.otsu_fname, a.bounds_pkl, a.coords_pkl,
                     a.feat_save_path, lvl=a.lvl, tile_size=a.tile_size,
                     batch_size=a.batch_size, encoder=enc)


if __name__ == "__main__":
    main()
