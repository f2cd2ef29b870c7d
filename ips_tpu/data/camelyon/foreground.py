"""Offline CLI 2/3: foreground tile coordinates -> pandas pickles.

Parity with reference data/camelyon/foreground.py:12-165: per-slide
foreground tiles via ``split_slide``, emitting ``bounds_{sub}.pkl``
(per-slide start/end row ids) and ``coords_{sub}.pkl`` (flat table
name/x/y/pos_id) in the same schema.

Usage: python -m ips_tpu.data.camelyon.foreground [--train|--test] ... \
           data_dir otsu_fname out_dir
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
from functools import partial

import pandas as pd

from ips_tpu.data.camelyon.methods import split_slide
from ips_tpu.data.camelyon.slide import SlideManager


def _slide_coords(name: str, *, data_dir: str, otsu_fname: str, lvl: int,
                  otsu_lvl: int, tile_size: int, fg_perc_thresh: float,
                  overlap: int):
    slide_man = SlideManager(data_dir=data_dir, otsu_fname=otsu_fname)
    slide = slide_man.get_slide(name)
    otsu_threshold = slide.get_otsu_threshold(otsu_lvl)
    if otsu_threshold is None:
        raise ValueError(f"no otsu threshold for slide {name} at level "
                         f"{otsu_lvl}; run the otsu CLI first")
    xs, ys = [], []
    for _, bounds in split_slide(slide, lvl, otsu_threshold, fg_perc_thresh,
                                 tile_size, overlap):
        xs.append(bounds[0][0])
        ys.append(bounds[0][1])
    print("Finished slide: ", name, flush=True)
    return xs, ys, [name] * len(xs)


def compute_foreground(data_dir: str, otsu_fname: str, out_dir: str, *,
                       train: bool = True, lvl: int = 0, otsu_lvl: int = 0,
                       tile_size: int = 256, fg_perc_thresh: float = 0.01,
                       overlap: int = 0, n_worker: int = 16):
    os.makedirs(out_dir, exist_ok=True)
    slide_man = SlideManager(data_dir=data_dir, otsu_fname=otsu_fname)
    names = slide_man.get_slide_names_subset(train=train)

    fn = partial(_slide_coords, data_dir=data_dir, otsu_fname=otsu_fname,
                 lvl=lvl, otsu_lvl=otsu_lvl, tile_size=tile_size,
                 fg_perc_thresh=fg_perc_thresh, overlap=overlap)
    if n_worker > 1:
        with mp.Pool(n_worker) as pool:
            results = list(pool.imap(fn, names))
    else:
        results = [fn(n) for n in names]

    # Flat coordinate table + per-slide [start_id, end_id] ranges
    # (reference foreground.py:113-165).
    all_x, all_y, all_names = [], [], []
    bounds_rows = []
    for name, (xs, ys, ns) in zip(names, results):
        if not xs:
            # blank/glass slide (or fg_perc_thresh too high): no tiles.
            # Emitting a bounds row with end_id < start_id would crash
            # every downstream consumer — skip the slide with a warning.
            print(f"warning: slide {name} produced no foreground tiles; "
                  f"skipping", file=sys.stderr)
            continue
        start = len(all_x)
        all_x.extend(xs)
        all_y.extend(ys)
        all_names.extend(ns)
        bounds_rows.append({"name": ns[0],
                            "start_id": start,
                            "end_id": len(all_x) - 1})
    coords = pd.DataFrame({
        "name": all_names, "x": all_x, "y": all_y,
        "pos_id": list(range(len(all_x)))})
    bounds = pd.DataFrame(bounds_rows)

    sub = "train" if train else "test"
    coords_path = os.path.join(out_dir, f"coords_{sub}.pkl")
    bounds_path = os.path.join(out_dir, f"bounds_{sub}.pkl")
    coords.to_pickle(coords_path)
    bounds.to_pickle(bounds_path)
    return coords_path, bounds_path


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Compute foreground coordinates for each slide")
    p.add_argument("--train", dest="is_train", action="store_true")
    p.add_argument("--test", dest="is_train", action="store_false")
    p.set_defaults(is_train=True)
    p.add_argument("--lvl", type=int, default=0)
    p.add_argument("--otsu_lvl", type=int, default=0)
    p.add_argument("--tile_size", type=int, default=256)
    p.add_argument("--fg_perc_thresh", type=float, default=0.01)
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--n_worker", type=int, default=16)
    p.add_argument("data_dir")
    p.add_argument("otsu_fname")
    p.add_argument("out_dir")
    a = p.parse_args(argv)
    coords, bounds = compute_foreground(
        a.data_dir, a.otsu_fname, a.out_dir, train=a.is_train, lvl=a.lvl,
        otsu_lvl=a.otsu_lvl, tile_size=a.tile_size,
        fg_perc_thresh=a.fg_perc_thresh, overlap=a.overlap,
        n_worker=a.n_worker)
    print(f"Wrote {coords} and {bounds}")


if __name__ == "__main__":
    main()
