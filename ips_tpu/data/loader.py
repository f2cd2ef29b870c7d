"""Threaded, prefetching host data pipeline.

Replaces the reference's ``torch.utils.data.DataLoader`` with
``num_workers`` processes (reference main.py:45-48) with a
framework-native loader: a thread pool materializes samples (numpy is
GIL-releasing for the heavy densify/patchify work) and a bounded prefetch
queue keeps batches ready while the TPU computes. ``pin_memory`` has no TPU
meaning; host->HBM transfer overlaps via ``jax.device_put`` in the training
loop.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


class Dataset:
    """Minimal dataset protocol: __len__ + __getitem__ -> dict[str, ndarray]."""

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:  # pragma: no cover
        raise NotImplementedError


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        vals = [np.asarray(s[k]) for s in samples]
        out[k] = np.stack(vals, axis=0)
    return out


class DataLoader:
    """Shuffling, batching, prefetching iterator over a Dataset.

    Batches are dicts of stacked numpy arrays, like the reference loader's
    ``{'input': patches, <task>: label}`` samples
    (reference data/megapixel_mnist/mnist_dataset.py:55-58).
    """

    def __init__(self, dataset: Dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False,
                 prefetch: int = 2, seed: int = 0,
                 collate_fn=None, process_index: int = 0,
                 process_count: int = 1, bucket_fn=None):
        """process_index/process_count: multi-host data sharding. Every
        process draws the SAME global batch order (seeded rng), then loads
        only its contiguous batch_size/process_count slice of each batch —
        no host loads (or transfers) another host's rows. Assemble the
        global array with parallel.distributed.make_global_batch. With
        process_count > 1 the final ragged batch is dropped so all
        processes agree on shapes.

        bucket_fn(i) -> hashable: when given, every batch contains only
        samples of one bucket (e.g. one padded shape), so variable-N
        datasets can batch B_seq > 1 — the reference is locked to
        B_seq=1 for camelyon because torch cannot stack ragged slides
        (reference config/camelyon_config.yml:4-5). Within-bucket order
        and the order of batches are both shuffled when shuffle=True.
        """
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"batch_size={batch_size} must be divisible by "
                f"process_count={process_count}")
        if not (0 <= process_index < max(process_count, 1)):
            raise ValueError(
                f"process_index={process_index} out of range for "
                f"process_count={process_count}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last or process_count > 1
        self.prefetch = max(1, prefetch)
        self.collate_fn = collate_fn or _collate
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self.bucket_fn = bucket_fn
        self._rng = np.random.default_rng(seed)
        if bucket_fn is not None:
            self._bucket_groups = {}
            for i in range(len(dataset)):
                self._bucket_groups.setdefault(bucket_fn(i), []).append(i)
            if self.drop_last:
                # With fixed bucket membership, drop_last permanently
                # excludes every bucket smaller than batch_size (unlike
                # the unbucketed ragged tail, whose membership reshuffles
                # per epoch) — surface that loudly.
                lost = sum(len(g) % self.batch_size
                           for g in self._bucket_groups.values())
                if lost:
                    import sys
                    print(f"warning: bucket-batched loader with drop_last "
                          f"permanently excludes {lost} samples in "
                          f"partial per-bucket batches", file=sys.stderr)

    def _n_batches(self, n: int) -> int:
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __len__(self) -> int:
        if self.bucket_fn is not None:
            return sum(self._n_batches(len(g))
                       for g in self._bucket_groups.values())
        return self._n_batches(len(self.dataset))

    def _batch_indices(self) -> List[np.ndarray]:
        if self.bucket_fn is not None:
            batches = []
            for key in sorted(self._bucket_groups):
                g = np.asarray(self._bucket_groups[key])
                if self.shuffle:
                    self._rng.shuffle(g)
                batches.extend(
                    g[j * self.batch_size:(j + 1) * self.batch_size]
                    for j in range(self._n_batches(len(g))))
            if self.shuffle:
                self._rng.shuffle(batches)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                self._rng.shuffle(idx)
            batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(len(self))]
        if self.process_count > 1:
            k = self.batch_size // self.process_count
            lo = self.process_index * k
            batches = [b[lo:lo + k] for b in batches]
        return batches

    def skip_epochs(self, k: int) -> None:
        """Advance the shuffle stream past `k` epochs without loading data.

        A resumed run (checkpoint restore at start_epoch > 0) otherwise
        replays the shuffle order of a FRESH run — epoch k would get the
        data order a fresh run used at epoch 0 (the reference has the
        same wart: torch's DataLoader reshuffles from the generator
        state at construction). Calling skip_epochs(start_epoch) after
        restore consumes exactly the draws __iter__ would have, so the
        resumed schedule is sample-order-identical to an unbroken run.
        Also realigns datasets with a sequential augmentation stream
        (e.g. traffic's per-item draw counter) via their `skip_draws`
        hook."""
        n_items = 0
        for _ in range(max(0, k)):
            n_items += sum(len(b) for b in self._batch_indices())
        skip = getattr(self.dataset, "skip_draws", None)
        if skip is not None and n_items:
            skip(n_items)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        if self.num_workers == 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return
        yield from self._iter_threaded(batches)

    def _iter_threaded(self, batches: List[np.ndarray]):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[Optional[BaseException]] = [None]
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices an abandoned consumer
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    def load(b):
                        samples = list(pool.map(
                            lambda i: self.dataset[int(i)], b))
                        return self.collate_fn(samples)
                    for b in batches:
                        if not put(load(b)):
                            return
            except BaseException as e:  # propagate to consumer
                error[0] = e
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            t.join()
            if error[0] is not None:
                raise error[0]
        finally:
            # consumer broke out / raised: unblock and stop the producer
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
