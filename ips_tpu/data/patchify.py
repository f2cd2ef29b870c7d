"""Host-side patch extraction (numpy equivalent of torch unfold).

The reference patchifies inside DataLoader workers with a double
``Tensor.unfold`` (reference data/megapixel_mnist/mnist_dataset.py:47-53,
data/traffic/traffic_dataset.py:337-343). Here it is a zero-copy numpy
stride trick producing NHWC patches (TPU's native conv layout).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def patchify(img: np.ndarray, patch_size: Tuple[int, int],
             patch_stride: Tuple[int, int]) -> np.ndarray:
    """(H, W, C) -> (n_patches, ph, pw, C), row-major patch order.

    Matches torch's ``unfold(1, ph, sh).unfold(2, pw, sw)`` patch order
    (patches scanned over rows then columns) with channels-last layout.
    """
    H, W, C = img.shape
    ph, pw = patch_size
    sh, sw = patch_stride
    nh = (H - ph) // sh + 1
    nw = (W - pw) // sw + 1
    s0, s1, s2 = img.strides
    patches = np.lib.stride_tricks.as_strided(
        img,
        shape=(nh, nw, ph, pw, C),
        strides=(s0 * sh, s1 * sw, s0, s1, s2),
        writeable=False,
    )
    return np.ascontiguousarray(patches.reshape(nh * nw, ph, pw, C))


def n_patches(hw: Tuple[int, int], patch_size: Tuple[int, int],
              patch_stride: Tuple[int, int]) -> int:
    nh = (hw[0] - patch_size[0]) // patch_stride[0] + 1
    nw = (hw[1] - patch_size[1]) // patch_stride[1] + 1
    return nh * nw
