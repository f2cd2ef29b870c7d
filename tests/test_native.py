"""Native host-ops vs numpy reference numerics + build."""

import numpy as np
import pytest

from ips_tpu.data.patchify import patchify
from ips_tpu.native import (densify_patchify, gather_patches, have_native,
                            patchify_dense)


def test_library_builds():
    assert have_native(), "g++ host-ops library failed to build"


def _sparse_case(rng, H, W, C, nnz):
    idx = rng.choice(H * W * C, size=nnz, replace=False).astype(np.int64)
    vals = rng.random(nnz).astype(np.float32)
    img = np.zeros(H * W * C, np.float32)
    img[idx] = vals
    return idx, vals, img.reshape(H, W, C)


class TestDensifyPatchify:
    @pytest.mark.parametrize("H,W,C,ps,st", [
        (60, 40, 1, (20, 20), (20, 20)),      # exact tiling
        (60, 40, 1, (20, 20), (10, 10)),      # 50% overlap
        (30, 30, 3, (10, 10), (10, 10)),      # multi-channel
        (64, 64, 1, (16, 16), (12, 12)),      # non-divisible stride
    ])
    def test_matches_dense_reference(self, np_rng, H, W, C, ps, st):
        idx, vals, img = _sparse_case(np_rng, H, W, C, nnz=200)
        expect = patchify(img, ps, st)
        got = densify_patchify(idx, vals, (H, W, C), ps, st)
        np.testing.assert_array_equal(got, expect)

    def test_empty_sparse(self):
        got = densify_patchify(np.zeros(0, np.int64), np.zeros(0, np.float32),
                               (20, 20, 1), (10, 10), (10, 10))
        assert got.shape == (4, 10, 10, 1) and not got.any()


def test_patchify_dense_matches(np_rng):
    img = np_rng.random((50, 70, 3)).astype(np.float32)
    for ps, st in [((10, 10), (10, 10)), ((20, 14), (10, 7))]:
        np.testing.assert_array_equal(patchify_dense(img, ps, st),
                                      patchify(img, ps, st))


def test_gather_patches_matches(np_rng):
    src = np_rng.random((3, 40, 8, 8, 1)).astype(np.float32)
    idx = np_rng.integers(0, 40, (3, 7)).astype(np.int32)
    expect = src[np.arange(3)[:, None], idx]
    np.testing.assert_array_equal(gather_patches(src, idx), expect)
    # feature-mode records (B, N, F)
    feat = np_rng.random((2, 30, 16)).astype(np.float32)
    fidx = np_rng.integers(0, 30, (2, 5)).astype(np.int32)
    np.testing.assert_array_equal(gather_patches(feat, fidx),
                                  feat[np.arange(2)[:, None], fidx])


def test_mnist_dataset_uses_native_path(tmp_path):
    """End-to-end: generator -> dataset -> patches identical to numpy path."""
    from ips_tpu.config import config_from_dict
    from ips_tpu.data.mnist import MegapixelMNIST, generate_megapixel_mnist
    d = str(tmp_path)
    generate_megapixel_mnist(d, n_train=2, n_test=1, width=200, height=200,
                             n_noise=3, digit_source="sklearn")
    conf = config_from_dict(dict(
        data_dir=d, patch_size=[50, 50], patch_stride=[50, 50], N=16, M=4,
        I=4, n_class=10, n_token=4,
        tasks={"task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task1": {"id": 1, "name": "max", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task2": {"id": 2, "name": "top", "act_fn": "softmax",
                         "metric": "accuracy"},
               "task3": {"id": 3, "name": "multi", "act_fn": "sigmoid",
                         "metric": "multilabel_accuracy"}}))
    ds = MegapixelMNIST(conf, train=True)
    item = ds[0]
    # independent reconstruction via dense numpy path
    sample = ds._data[0]
    img = np.zeros(200 * 200, np.float32)
    img[sample["input"][0]] = sample["input"][1]
    expect = patchify(img.reshape(200, 200, 1), (50, 50), (50, 50))
    np.testing.assert_array_equal(item["input"], expect)
