"""Offline CLI 1/3: per-slide Otsu thresholds -> CSV.

Parity with reference data/camelyon/otsu.py:8-73, including the
``mp.Pool`` fan-out, and fixing its crash: the reference writes to an
undefined ``out_dir`` variable (reference otsu.py:64; SURVEY.md §2 #18) —
here the CSV goes to the ``otsu_fname`` argument as documented.

Usage: python -m ips_tpu.data.camelyon.otsu [--lvl L] [--n_worker W] \
           data_dir otsu_fname
"""

from __future__ import annotations

import argparse
import csv
import multiprocessing as mp
import os
from functools import partial

from ips_tpu.data.camelyon.methods import get_otsu_threshold
from ips_tpu.data.camelyon.slide import Slide, SlideManager


def _slide_threshold(args, lvl: int = 0):
    name, slide_path = args
    slide = Slide(name, slide_path)
    try:
        threshold = get_otsu_threshold(slide, level=lvl, step_size=1000)
    finally:
        slide.close()
    return name, lvl, threshold


def compute_thresholds(data_dir: str, otsu_fname: str, lvl: int = 0,
                       n_worker: int = 16) -> str:
    slide_man = SlideManager(data_dir=data_dir, otsu_fname=otsu_fname)
    work = [(n, slide_man.slide_paths[n]) for n in slide_man.slide_names]
    fn = partial(_slide_threshold, lvl=lvl)
    if n_worker > 1:
        with mp.Pool(n_worker) as pool:
            rows = pool.map(fn, work)
    else:
        rows = [fn(w) for w in work]

    out_path = os.path.join(data_dir, otsu_fname)
    with open(out_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["name", "level", "threshold"])
        writer.writerows(rows)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Compute Otsu thresholds from WSIs")
    p.add_argument("--lvl", type=int, default=0)
    p.add_argument("--n_worker", type=int, default=16)
    p.add_argument("data_dir")
    p.add_argument("otsu_fname")
    a = p.parse_args(argv)
    out = compute_thresholds(a.data_dir, a.otsu_fname, a.lvl, a.n_worker)
    print(f"Done saving thresholds to {out}")


if __name__ == "__main__":
    main()
