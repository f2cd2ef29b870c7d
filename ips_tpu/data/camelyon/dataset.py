"""Training dataset over extracted CAMELYON16 features.

Parity with reference data/camelyon/camelyon_dataset.py:106-143 — one item
= one slide = variable-length (N_slide, 2048) feature array + binary label,
with lazy per-worker HDF5 handles.

TPU-first change: variable N would force a recompile per slide shape
(the reference tolerates ragged shapes because torch is eager;
camelyon_config.yml uses B_seq=1 for the same reason). Here each slide is
zero-padded to a *bucket* size with a validity mask, so selection compiles
once per bucket. Buckets default to M + I * 2^k and can be pinned via
``conf.bucket_sizes``. Zero-padding matches the reference's own zero-fill
of short slides into the (B, M) batch buffer
(reference training/iterative.py:7-29,38).
"""

from __future__ import annotations

import os
import threading
from bisect import bisect_left
from typing import Dict, List

import numpy as np

from ips_tpu.data.loader import Dataset


def default_buckets(max_n: int, M: int, I: int) -> List[int]:
    """Geometric bucket ladder: M, M+I, M+2I, M+4I, ... >= max_n."""
    buckets = [M]
    k = 1
    while buckets[-1] < max_n:
        buckets.append(M + k * I)
        k *= 2
    return buckets


def pad_to_bucket(x: np.ndarray, buckets: List[int]):
    """(N, F) -> ((bucket, F) zero-padded, (bucket,) bool mask)."""
    n = x.shape[0]
    i = bisect_left(buckets, n)
    if i == len(buckets):
        raise ValueError(f"slide with {n} patches exceeds largest bucket "
                         f"{buckets[-1]}")
    b = buckets[i]
    out = np.zeros((b,) + x.shape[1:], x.dtype)
    out[:n] = x
    mask = np.zeros(b, bool)
    mask[:n] = True
    return out, mask


class CamelyonFeatures(Dataset):
    """HDF5-backed slide features with bucketed padding + mask."""

    def __init__(self, conf, train: bool = True):
        self.tasks = conf.task_list
        fname = conf.train_fname if train else conf.test_fname
        self.path = os.path.join(conf.data_dir, fname)
        self._local = threading.local()     # lazy per-thread HDF5 handle
        import h5py
        with h5py.File(self.path, "r") as f:
            self.slide_names = list(f.keys())
            self._ns = [f[s]["img"].shape[0] for s in self.slide_names]
        max_n = max(self._ns, default=conf.M)
        self.buckets = (list(conf.bucket_sizes) if conf.bucket_sizes
                        else default_buckets(max_n, conf.M, conf.I))

    def bucket_of(self, i: int) -> int:
        """Padded bucket size of slide i (for bucket-batched loading:
        DataLoader(bucket_fn=ds.bucket_of) lets B_seq > 1 batch
        same-shape slides — the reference is locked to B_seq=1,
        config/camelyon_config.yml:4-5). Raises for slides exceeding the
        largest bucket at loader-construction time, where pad_to_bucket
        would otherwise fail mid-epoch inside a worker thread."""
        j = bisect_left(self.buckets, self._ns[i])
        if j == len(self.buckets):
            raise ValueError(
                f"slide {self.slide_names[i]} with {self._ns[i]} patches "
                f"exceeds largest bucket {self.buckets[-1]}; set "
                "conf.bucket_sizes accordingly")
        return self.buckets[j]

    def _file(self):
        import h5py
        if not hasattr(self._local, "f"):
            self._local.f = h5py.File(self.path, "r")
        return self._local.f

    def __len__(self) -> int:
        return len(self.slide_names)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        grp = self._file()[self.slide_names[i]]
        feats = grp["img"][:].astype(np.float32)
        label = int(grp.attrs["label"])
        padded, mask = pad_to_bucket(feats, self.buckets)
        out = {"input": padded, "mask": mask}
        for t in self.tasks:
            out[t.name] = np.int64(label)
        return out


def make_synth_features(path: str, n_slides: int = 8, feat_dim: int = 32,
                        n_range=(40, 200), seed: int = 0,
                        signal: float = 2.0,
                        compression: str | None = "gzip") -> str:
    """Write a small synthetic features HDF5 in the reference layout.

    Tumor slides get a handful of high-magnitude 'lesion' feature rows, so
    the IPS + AUC path is end-to-end learnable without the 700 GB corpus.
    ``compression=None`` writes uncompressed datasets — gzip of random
    floats runs ~20 MB/s on one core, which makes reference-scale proof
    corpora (N~10k, 2048-dim) impractically slow to generate.
    """
    import h5py
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        for i in range(n_slides):
            n = int(rng.integers(*n_range))
            label = i % 2
            feats = rng.normal(0, 1, (n, feat_dim)).astype(np.float32)
            if label:
                k = max(1, n // 20)
                rows = rng.choice(n, k, replace=False)
                feats[rows, : feat_dim // 2] += signal
            grp = f.create_group(f"slide_{'test_' if i >= n_slides//2 else ''}"
                                 f"{i:03d}")
            grp.create_dataset("img", data=feats, compression=compression)
            grp.create_dataset("pos", data=np.arange(n),
                               compression=compression)
            grp.attrs["label"] = label
    return path
