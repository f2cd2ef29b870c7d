"""End-to-end CAMELYON16 image mode: train the conv encoder on raw tiles.

The reference trains CAMELYON only on pre-extracted BYOL features
(reference config/camelyon_config.yml `is_image: False`); raw-tile
end-to-end training is listed as a stress scenario in BASELINE.md. This
dataset serves one *slide* per item as its foreground tiles, kept uint8
(1/4 the fp32 footprint) with bucketed padding + mask; with
``eager: false`` the tiles stay in host RAM and the streaming selector
moves only O(M+I) tiles to HBM — full-resolution slides never need to fit
on the device.

Requires the otsu + foreground CLIs to have run (same pickles the
feature-extraction path uses).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ips_tpu.data.camelyon.dataset import default_buckets
from ips_tpu.data.camelyon.slide import SlideManager
from ips_tpu.data.loader import Dataset


class CamelyonPatches(Dataset):
    """One item = one slide = (bucket_N, ph, pw, 3) uint8 tiles + mask."""

    def __init__(self, conf, train: bool = True, lvl: int = 0,
                 otsu_fname: str = "otsu.csv",
                 coords_dir: Optional[str] = None,
                 max_tiles: Optional[int] = None):
        import pandas as pd
        self.conf = conf
        self.tasks = conf.task_list
        self.lvl = lvl
        self.tile_hw = conf.patch_size
        self.max_tiles = max_tiles
        sub = "train" if train else "test"
        coords_dir = coords_dir or os.path.join(conf.data_dir, "fg")
        self.coords = pd.read_pickle(
            os.path.join(coords_dir, f"coords_{sub}.pkl"))
        self.bounds = pd.read_pickle(
            os.path.join(coords_dir, f"bounds_{sub}.pkl"))
        self.slide_man = SlideManager(data_dir=conf.data_dir,
                                      otsu_fname=otsu_fname)
        counts: List[int] = []
        for row in self.bounds.itertuples():
            n = row.end_id - row.start_id + 1
            counts.append(min(n, max_tiles) if max_tiles else n)
        self._ns = counts
        max_n = max(counts) if counts else conf.M
        self.buckets = (list(conf.bucket_sizes) if conf.bucket_sizes
                        else default_buckets(max_n, conf.M, conf.I))

    def bucket_of(self, i: int) -> int:
        """Padded bucket size of slide i (bucket-batched loading hook,
        same contract as CamelyonFeatures.bucket_of)."""
        from bisect import bisect_left
        j = bisect_left(self.buckets, self._ns[i])
        if j == len(self.buckets):
            raise ValueError(
                f"slide {self.bounds.iloc[i]['name']} has {self._ns[i]} "
                f"tiles, exceeding the largest bucket {self.buckets[-1]}; "
                "extend conf.bucket_sizes or set max_tiles")
        return self.buckets[j]

    def __len__(self) -> int:
        return len(self.bounds)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        from bisect import bisect_left
        row = self.bounds.iloc[i]
        slide = self.slide_man.get_slide(row["name"])
        rows = self.coords.iloc[row["start_id"]:row["end_id"] + 1]
        if self.max_tiles and len(rows) > self.max_tiles:
            rows = rows.iloc[:self.max_tiles]
        ph, pw = self.tile_hw
        n = len(rows)
        bi = bisect_left(self.buckets, n)
        if bi == len(self.buckets):
            raise ValueError(
                f"slide {row['name']} has {n} tiles, exceeding the largest "
                f"bucket {self.buckets[-1]}; extend conf.bucket_sizes or "
                "set max_tiles")
        b = self.buckets[bi]
        tiles = np.zeros((b, ph, pw, 3), np.uint8)
        # batched read: array-backed readers gather all n tiles in one
        # vectorized index (the per-tile Python loop was the dominant
        # host cost of lazy large-N epochs); OpenSlide readers loop
        # internally, as any WSI reader must
        xy = rows[["x", "y"]].to_numpy()
        slide.read_tiles(xy, self.lvl, (pw, ph), out=tiles[:n])
        mask = np.zeros(b, bool)
        mask[:n] = True
        out = {"input": tiles, "mask": mask}
        label = int(slide.has_tumor)
        for t in self.tasks:
            out[t.name] = np.int64(label)
        return out
