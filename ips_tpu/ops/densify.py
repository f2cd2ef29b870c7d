"""On-device sparse densification: (indices, values) -> patch tensor.

Megapixel-MNIST images are ~0.3% dense; the reference densifies on the
host and ships the full patch tensor to the device (reference
data/megapixel_mnist/mnist_dataset.py:34-53 + main.py's `.to(device)`),
which costs O(H*W) host->HBM bandwidth per image. With ``sparse_input``
the loader ships only the sparse pairs (O(nnz), ~100x less traffic) and
this op scatters them into (B, N, ph, pw, C) patches on the TPU — the
scatter itself is a trivial VPU op. Requires exact tiling
(patch_stride == patch_size), which is the shipped MNIST configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def densify_patches(flat_idx: jax.Array, values: jax.Array,
                    img_hw: tuple, patch_size: tuple,
                    n_chan: int = 1,
                    out_dtype=jnp.float32) -> jax.Array:
    """(B, nnz) int32 flat indices over (H, W, C) + (B, nnz) values
    -> (B, N, ph, pw, C). Padded entries must carry value 0 (their index
    may be any valid position; scatter-add keeps them harmless).
    """
    H, W = img_hw
    ph, pw = patch_size
    if H % ph or W % pw:
        raise ValueError("densify_patches requires exact tiling")
    nw = W // pw
    n_patches = (H // ph) * nw

    B, nnz = flat_idx.shape
    idx = flat_idx.astype(jnp.int32)
    c = idx % n_chan
    pix = idx // n_chan
    w = pix % W
    h = pix // W
    patch = (h // ph) * nw + (w // pw)
    dy = h % ph
    dx = w % pw

    out = jnp.zeros((B, n_patches, ph, pw, n_chan), out_dtype)
    b = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, nnz))
    return out.at[b, patch, dy, dx, c].add(values.astype(out_dtype))
