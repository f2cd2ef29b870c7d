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

Output: HDF5 groups per slide with datasets ``img`` (N, 2048) and ``pos``
(N,), group attr ``label``, gzip-compressed — byte-compatible with the
reference's file (reference extract_feat.py:164-171), so features
extracted by either pipeline train in either framework.

Usage: python -m ips_tpu.data.camelyon.extract_feat [--train|--test] ... \
           data_dir otsu_fname bounds_pkl coords_pkl feat_save_path
"""

from __future__ import annotations

import argparse
from typing import Callable, Optional

import numpy as np

TILE_CROP = 224  # center crop of the 256-tile (reference extract_feat.py:64)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = max(0, (h - size) // 2)
    x0 = max(0, (w - size) // 2)
    return img[y0:y0 + size, x0:x0 + size]


def make_jax_encoder(enc_type: str = "resnet50",
                     pretrained_path: str = "",
                     batch_size: int = 64) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted eval-mode ResNet encoder: (B, 224, 224, 3) float -> (B, D)."""
    import jax
    import jax.numpy as jnp

    from ips_tpu.models.encoders import ConvPatchEncoder
    from ips_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = ConvPatchEncoder(enc_type=enc_type, n_chan_in=3, n_res_blocks=4,
                             dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, TILE_CROP, TILE_CROP, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if pretrained_path:
        from ips_tpu.models.pretrained import load_encoder_npz
        variables = load_encoder_npz(pretrained_path, variables)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=False)

    def encode(batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        if n < batch_size:  # pad tail batch to keep one compiled shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n,) + batch.shape[1:],
                                 batch.dtype)])
        return np.asarray(fwd(jnp.asarray(batch)))[:n]

    return encode


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
    encode = encoder or make_jax_encoder(batch_size=batch_size)

    with h5py.File(feat_save_path, "w") as h5:
        for n_done, row in enumerate(bounds.itertuples(), start=1):
            slide = slide_man.get_slide(row.name)
            rows = coords.iloc[row.start_id:row.end_id + 1]
            feats, pos_ids = [], []
            xy = rows[["x", "y"]].to_numpy()
            all_pos = rows["pos_id"].to_numpy()
            # batched tile reads (one vectorized gather per encoder batch
            # on array-backed slides); crop/scale the whole batch at once
            y0 = max(0, (tile_size - TILE_CROP) // 2)
            for s in range(0, len(xy), batch_size):
                tiles = slide.read_tiles(xy[s:s + batch_size], lvl,
                                         (tile_size, tile_size))
                tiles = tiles[:, y0:y0 + TILE_CROP, y0:y0 + TILE_CROP]
                feats.append(encode(tiles.astype(np.float32) / 255.0))
                pos_ids.extend(int(p) for p in all_pos[s:s + batch_size])
            slide.close()

            features_np = (np.concatenate(feats, axis=0) if feats
                           else np.zeros((0, 2048), np.float32))
            grp = h5.create_group(row.name)
            grp.create_dataset("img", data=features_np, compression="gzip",
                               compression_opts=9)
            grp.create_dataset("pos", data=np.asarray(pos_ids, np.int64),
                               compression="gzip", compression_opts=9)
            grp.attrs["label"] = int(slide.has_tumor)
            print("Nr. slides processed: ", n_done, flush=True)
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
