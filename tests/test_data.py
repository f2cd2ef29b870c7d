"""Data layer: patchify golden test, loader, megapixel-MNIST generator."""

import json
import os

import numpy as np
import pytest

from ips_tpu.config import config_from_dict
from ips_tpu.data.loader import DataLoader, Dataset
from ips_tpu.data.mnist import (MegapixelMNIST, generate_megapixel_mnist,
                                load_digit_bank)
from ips_tpu.data.patchify import n_patches, patchify


class TestPatchify:
    def test_matches_manual_reshape(self):
        img = np.arange(6 * 8 * 2, dtype=np.float32).reshape(6, 8, 2)
        p = patchify(img, (3, 4), (3, 4))
        assert p.shape == (2 * 2, 3, 4, 2)
        # patch order: rows of patches scanned left-to-right (torch unfold)
        np.testing.assert_array_equal(p[0], img[0:3, 0:4])
        np.testing.assert_array_equal(p[1], img[0:3, 4:8])
        np.testing.assert_array_equal(p[2], img[3:6, 0:4])
        np.testing.assert_array_equal(p[3], img[3:6, 4:8])

    def test_overlapping_stride(self):
        img = np.random.rand(8, 8, 1).astype(np.float32)
        p = patchify(img, (4, 4), (2, 2))
        assert p.shape == (9, 4, 4, 1)
        np.testing.assert_array_equal(p[4], img[2:6, 2:6])
        assert n_patches((8, 8), (4, 4), (2, 2)) == 9


class _Rand(Dataset):
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"input": np.full((3, 2), i, np.float32),
                "y": np.int64(i)}


class TestDataLoader:
    def test_batching_order(self):
        dl = DataLoader(_Rand(10), batch_size=4, shuffle=False)
        batches = list(dl)
        assert len(dl) == 3 and len(batches) == 3
        np.testing.assert_array_equal(batches[0]["y"], [0, 1, 2, 3])
        assert batches[2]["input"].shape == (2, 3, 2)  # partial tail

    def test_threaded_matches_serial(self):
        serial = [b["y"] for b in DataLoader(_Rand(17), 5, shuffle=False)]
        threaded = [b["y"] for b in DataLoader(_Rand(17), 5, shuffle=False,
                                               num_workers=4)]
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a, b)

    def test_shuffle_covers_all(self):
        dl = DataLoader(_Rand(20), 4, shuffle=True, seed=1)
        ys = np.concatenate([b["y"] for b in dl])
        assert sorted(ys.tolist()) == list(range(20))
        ys2 = np.concatenate([b["y"] for b in dl])
        assert not np.array_equal(ys, ys2)  # reshuffles per epoch

    def test_bucket_fn_batches_are_homogeneous(self):
        """bucket_fn groups every batch by bucket (variable-N batching:
        the reference is locked to B_seq=1 for camelyon,
        config/camelyon_config.yml:4-5)."""
        buckets = [10, 20, 10, 20, 10, 20, 10, 20, 10, 10, 20, 7]
        dl = DataLoader(_Rand(12), batch_size=4, shuffle=True, seed=3,
                        bucket_fn=lambda i: buckets[i])
        batches = list(dl)
        assert len(dl) == len(batches)
        ys = np.concatenate([b["y"] for b in batches])
        assert sorted(ys.tolist()) == list(range(12))    # each sample once
        for b in batches:
            bs = {buckets[int(y)] for y in b["y"]}
            assert len(bs) == 1, f"mixed-bucket batch: {b['y']}"
        # 5x bucket-10 -> 2 batches, 5x bucket-20 -> 2, 1x bucket-7 -> 1
        assert len(batches) == 5

    def test_bucket_fn_drop_last(self):
        buckets = [0] * 5 + [1] * 6
        dl = DataLoader(_Rand(11), batch_size=4, drop_last=True,
                        bucket_fn=lambda i: buckets[i])
        assert len(dl) == 2
        assert all(len(b["y"]) == 4 for b in dl)

    def test_worker_error_propagates(self):
        class Bad(_Rand):
            def __getitem__(self, i):
                raise RuntimeError("boom")
        with pytest.raises(RuntimeError, match="boom"):
            list(DataLoader(Bad(4), 2, num_workers=2))

    def test_skip_epochs_realigns_resumed_shuffle(self):
        """A restored run's loader must produce the SAME per-epoch
        sample order as the unbroken run (resume support: main.py calls
        skip_epochs(start_epoch) after checkpoint restore)."""
        unbroken = DataLoader(_Rand(17), 4, shuffle=True, seed=7)
        orders = [np.concatenate([b["y"] for b in unbroken])
                  for _ in range(4)]
        resumed = DataLoader(_Rand(17), 4, shuffle=True, seed=7)
        resumed.skip_epochs(2)
        np.testing.assert_array_equal(
            np.concatenate([b["y"] for b in resumed]), orders[2])
        np.testing.assert_array_equal(
            np.concatenate([b["y"] for b in resumed]), orders[3])

    def test_skip_epochs_realigns_dataset_draws(self):
        """skip_epochs forwards the item-fetch count to the dataset's
        skip_draws hook (traffic's sequential augmentation counter)."""
        class Counting(_Rand):
            def __init__(self, n):
                super().__init__(n)
                self.skipped = 0

            def skip_draws(self, n):
                self.skipped += n

        ds = Counting(10)
        dl = DataLoader(ds, 4, shuffle=True, seed=0)
        dl.skip_epochs(3)
        assert ds.skipped == 30  # 10 items x 3 epochs, tail included


class TestMegapixelMNIST:
    @pytest.fixture(scope="class")
    def dset_dir(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("mnist"))
        generate_megapixel_mnist(d, n_train=6, n_test=3, width=200,
                                 height=200, n_noise=5, seed=0,
                                 digit_source="sklearn")
        return d

    def test_generator_files(self, dset_dir):
        with open(os.path.join(dset_dir, "parameters.json")) as f:
            params = json.load(f)
        assert params["width"] == 200 and params["n_train"] == 6
        train = np.load(os.path.join(dset_dir, "train.npy"),
                        allow_pickle=True)
        assert len(train) == 6
        s = train[0]
        assert {"input", "majority", "max", "top", "multi"} <= set(s.keys())

    def test_labels_consistent(self, dset_dir):
        for s in np.load(os.path.join(dset_dir, "train.npy"),
                         allow_pickle=True):
            multi = np.flatnonzero(s["multi"])
            assert s["majority"] in multi        # 3-of-5 digit is present
            assert s["max"] == multi.max()       # max over present digits
            assert s["top"] in multi
            assert 2 <= len(multi) <= 3          # 3 same + 2 others

    def test_dataset_patchifies(self, dset_dir):
        conf = config_from_dict(dict(
            data_dir=dset_dir, patch_size=[50, 50], patch_stride=[50, 50],
            N=16, M=4, I=4, n_class=10, n_token=4,
            tasks={
                "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                          "metric": "accuracy"},
                "task1": {"id": 1, "name": "max", "act_fn": "softmax",
                          "metric": "accuracy"},
                "task2": {"id": 2, "name": "top", "act_fn": "softmax",
                          "metric": "accuracy"},
                "task3": {"id": 3, "name": "multi", "act_fn": "sigmoid",
                          "metric": "multilabel_accuracy"},
            }))
        ds = MegapixelMNIST(conf, train=True)
        assert len(ds) == 6
        item = ds[0]
        assert item["input"].shape == (16, 50, 50, 1)  # 200/50 squared
        assert item["input"].max() > 0                  # digits present
        assert item["multi"].shape == (10,)

    def test_sparse_roundtrip_density(self, dset_dir):
        train = np.load(os.path.join(dset_dir, "train.npy"),
                        allow_pickle=True)
        idx, vals = train[0]["input"]
        assert len(idx) == len(vals) and len(idx) < 200 * 200 * 0.5


def test_digit_banks():
    x, y = load_digit_bank("sklearn", train=True)
    assert x.shape[1:] == (28, 28) and x.max() <= 1.0
    assert set(np.unique(y)) == set(range(10))
    xs, ys = load_digit_bank("synthetic", train=True)
    assert xs.shape[1:] == (28, 28)
    assert set(np.unique(ys)) == set(range(10))
