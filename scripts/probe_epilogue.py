"""TPU micro-probe: scorer softmax epilogue cost by layout.

The v2 pallas scorer's GEMM matches XLA (RESULTS scorer table) but the
XLA epilogue over its materialized logits measured ~0.5 ms — far above
the ~6 MB of traffic involved. This probe times the epilogue expression
alone in candidate layouts to attribute the cost:

  a) transposed (B, TH, L): softmax over the LANE axis
  b) natural   (B, L, TH): softmax over the middle axis, minor dim 8
  c) flattened (B*TH, L) 2D
  d) transposed without the bias add

Run ON TPU: python scripts/probe_epilogue.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ips_tpu.utils.cache import enable_compilation_cache
from ips_tpu.constants import NEG_INF

enable_compilation_cache()

sys.path.insert(0, "scripts")
from probe_scorer import time_op  # noqa: E402

B, TH, L = 16, 8, 10240
Lv = 10000


def main():
    rng = np.random.default_rng(0)
    lt = jnp.asarray(rng.random((B, TH, L)), jnp.float32)      # transposed
    ln = jnp.asarray(rng.random((B, L, TH)), jnp.float32)      # natural
    bias = jnp.where(jnp.arange(L) < Lv, 0.0, NEG_INF)[None, :]
    bias = jnp.broadcast_to(bias, (B, L)).astype(jnp.float32)

    def epi_t(lg, bias):
        p = jax.nn.softmax(lg + bias[:, None, :], axis=-1)
        return p.mean(axis=1)[:, :Lv]

    def epi_n(lg, bias):
        p = jax.nn.softmax(lg + bias[:, :, None], axis=1)
        return p.mean(axis=-1)[:, :Lv]

    def epi_2d(lg, bias):
        f = (lg + bias[:, None, :]).reshape(B * TH, L)
        p = jax.nn.softmax(f, axis=-1).reshape(B, TH, L)
        return p.mean(axis=1)[:, :Lv]

    def epi_nobias(lg):
        return jax.nn.softmax(lg, axis=-1).mean(axis=1)[:, :Lv]

    for name, fn, args in (
            ("transposed+bias", epi_t, (lt, bias)),
            ("natural+bias", epi_n, (ln, bias)),
            ("flat2d+bias", epi_2d, (lt, bias)),
            ("transposed nobias", epi_nobias, (lt,))):
        t = time_op(fn, *args)
        print(f"{name:20s}: {t * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
