"""Weight-aware BatchNorm.

The training loop zero-pads partial batches and masks them with
per-instance weights (ips_tpu/train/loop.py). Plain BatchNorm would still
fold the all-zero padded rows into the batch mean/variance, corrupting
normalization for the real rows and polluting the running statistics the
selection pass depends on — the reference avoids this by physically
shrinking the batch (reference training/iterative.py:52-63).

``MaskedBatchNorm`` computes weighted batch statistics: with all-ones
weights it is *numerically identical* to standard BatchNorm (torch
semantics: momentum 0.1 == decay 0.9, eps 1e-5), and with 0-weighted rows
it reproduces exactly what the reference's shrunk batch would compute —
one code path, no recompiles, no branching on data.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        """x: (N, ..., C); weights: optional (N,) row weights."""
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if weights is None:
                mean = x32.mean(axis=reduce_axes)
                var = x32.var(axis=reduce_axes)
                count = jnp.asarray(x32.size // features, jnp.float32)
            else:
                w = weights.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))                # (N,1,..,1)
                denom = jnp.maximum(
                    w.sum() * (x32.size // (x.shape[0] * features)), 1.0)
                mean = (x32 * w).sum(axis=reduce_axes) / denom
                var = (((x32 - mean) ** 2) * w).sum(axis=reduce_axes) / denom
                count = denom
            if not self.is_initializing():
                m = self.momentum
                # torch normalizes with the biased variance but stores the
                # Bessel-corrected (unbiased) one in running_var
                bessel = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
