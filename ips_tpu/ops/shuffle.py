"""Tie-break shuffling for patch selection.

The reference physically permutes the patch tensor (and the positional
table with the same indices) before selection so that equal-scoring patches
are sampled uniformly (reference utils/utils.py:33-58, ips_net.py:118-134).

On TPU we never move the (B, N, ph, pw, C) patch tensor: we build a
*permutation of indices* and let the selection engine gather chunks through
it. Positional encodings are looked up by the patch's original index, which
is exactly what the reference's paired shuffle achieves.

Padding-aware: with variable-N data the batch carries a validity mask;
real patches are permuted among themselves and padded slots sink to the
end, so the initial top-M buffer is filled with real patches whenever
n_valid >= M (mirroring the reference, which never pads).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_permutation(rng: Optional[jax.Array], B: int, N: int,
                     mask: Optional[jax.Array],
                     shuffle: bool, shuffle_style: str = "batch") -> jax.Array:
    """Return perm (B, N) int32; row b processes patches[b, perm[b]] in order.

    shuffle_style 'batch' uses one permutation shared across the batch
    (reference utils/utils.py:33-41); 'instance' permutes each row
    independently (reference utils/utils.py:43-58).
    """
    if not shuffle:
        if mask is None:
            return jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        # Stable sort: real (mask=True) first, original order preserved.
        order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
        return order.astype(jnp.int32)

    if rng is None:
        raise ValueError("shuffle=True requires an rng key")

    if shuffle_style == "batch":
        u = jax.random.uniform(rng, (1, N))
        u = jnp.broadcast_to(u, (B, N))
    elif shuffle_style == "instance":
        u = jax.random.uniform(rng, (B, N))
    else:
        raise ValueError(f"unknown shuffle_style {shuffle_style!r}")

    if mask is not None:
        # Push padded slots past every real patch regardless of u in [0, 1).
        u = jnp.where(mask, u, u + 2.0)
    return jnp.argsort(u, axis=1).astype(jnp.int32)
