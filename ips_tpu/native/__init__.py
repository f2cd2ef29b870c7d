"""Native host-ops with transparent numpy fallback.

`densify_patchify`, `patchify_dense`, and `gather_patches` dispatch to the
C++ library (built on demand with g++) and fall back to numpy when a
compiler is unavailable. Numerics are identical either way
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        from ips_tpu.native.build import build
        lib = ctypes.CDLL(build())
    except Exception:  # noqa: BLE001 - no compiler / load failure: fallback
        _lib = None
        return None
    i64, f32p, i64p, i32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_int32))
    lib.densify_patchify_f32.argtypes = [i64p, f32p, i64, i64, i64, i64,
                                         i64, i64, i64, i64, f32p]
    lib.patchify_f32.argtypes = [f32p, i64, i64, i64, i64, i64, i64, i64,
                                 f32p]
    lib.gather_patches_f32.argtypes = [f32p, i32p, i64, i64, i64, i64, f32p]
    _lib = lib
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def have_native() -> bool:
    return _load() is not None


def densify_patchify(indices: np.ndarray, values: np.ndarray,
                     img_shape: Tuple[int, int, int],
                     patch_size: Tuple[int, int],
                     patch_stride: Tuple[int, int]) -> np.ndarray:
    """Sparse flat (indices, values) over (H, W, C) -> (n, ph, pw, C).

    O(nnz) — never materializes the dense image.
    """
    H, W, C = img_shape
    ph, pw = patch_size
    sh, sw = patch_stride
    nh, nw = (H - ph) // sh + 1, (W - pw) // sw + 1
    out = np.zeros((nh * nw, ph, pw, C), np.float32)
    lib = _load()
    if lib is not None:
        idx = np.ascontiguousarray(indices, np.int64)
        vals = np.ascontiguousarray(values, np.float32)
        lib.densify_patchify_f32(
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _fp(vals),
            len(idx), H, W, C, ph, pw, sh, sw, _fp(out))
        return out
    # numpy fallback: densify then patchify
    from ips_tpu.data.patchify import patchify
    img = np.zeros(H * W * C, np.float32)
    img[np.asarray(indices)] = values
    return patchify(img.reshape(H, W, C), patch_size, patch_stride)


def patchify_dense(img: np.ndarray, patch_size: Tuple[int, int],
                   patch_stride: Tuple[int, int]) -> np.ndarray:
    """Dense (H, W, C) float32 -> (n, ph, pw, C)."""
    lib = _load()
    from ips_tpu.data.patchify import patchify
    if lib is None or img.dtype != np.float32:
        return patchify(img, patch_size, patch_stride)
    img = np.ascontiguousarray(img)
    H, W, C = img.shape
    ph, pw = patch_size
    sh, sw = patch_stride
    nh, nw = (H - ph) // sh + 1, (W - pw) // sw + 1
    out = np.empty((nh * nw, ph, pw, C), np.float32)
    lib.patchify_f32(_fp(img), H, W, C, ph, pw, sh, sw, _fp(out))
    return out


def gather_patches(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[b, k] = src[b, idx[b, k]]; src (B, N, ...), idx (B, K)."""
    lib = _load()
    if lib is None or src.dtype != np.float32:
        return src[np.arange(src.shape[0])[:, None], idx]
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, np.int32)
    B, N = src.shape[:2]
    K = idx.shape[1]
    elems = int(np.prod(src.shape[2:]))
    out = np.empty((B, K) + src.shape[2:], np.float32)
    lib.gather_patches_f32(
        _fp(src), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, N, K, elems, _fp(out))
    return out
