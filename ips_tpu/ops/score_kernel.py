"""Fused saliency scorer: one GEMM + masked softmax + head/token mean.

The reference computes patch saliency by materializing per-head keys
k = x @ Wk of shape (B, L, H*D_k), dotting with projected query tokens,
softmaxing, and averaging over heads and tokens
(reference architecture/transformer.py:71-83,143-148). On TPU this is
wasteful: the query tokens are *learned constants* at scoring time, so the
query projection can be folded into the key projection:

    W_eff[d, (t, h)] = sum_k Wk[d, (h, k)] * (q @ Wq)[t, h, k]
    logits[b, l, t, h] = x[b, l] . W_eff[:, (t, h)] / sqrt(D_k)

which turns the entire scorer into a single (L, D) x (D, T*H) matmul —
the (B, L, H*D_k) key tensor is never materialized. Two implementations:

  * ``fast_scores`` — pure JAX/XLA (default scoring path).
  * ``pallas_scores`` — Pallas logits GEMM (grid over (B, L-tiles),
    Mosaic-pipelined bf16 MXU passes, transposed (TH, L) fp32 output
    blocks) + an XLA softmax epilogue over the ~3%-sized logits tensor.
    Numerics match ``fast_scores`` to float tolerance
    (tests/test_score_kernel.py).

Both are exactly equivalent to the reference attention-mean scoring.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ips_tpu.constants import NEG_INF


def fold_query(q: jax.Array, wq: jax.Array, wk: jax.Array, H: int,
               D_k: int) -> jax.Array:
    """Fold learned query tokens into the key projection.

    q: (1, T, D) raw query tokens; wq, wk: (D, H*D_k) projection kernels.
    Returns W_eff (D, T*H), already scaled by 1/sqrt(D_k).
    """
    T = q.shape[1]
    D = q.shape[2]
    qp = (q[0] @ wq).reshape(T, H, D_k)          # projected queries
    wk_h = wk.reshape(D, H, D_k)
    w_eff = jnp.einsum("dhk,thk->dth", wk_h, qp,
                       preferred_element_type=jnp.float32)
    return (w_eff / math.sqrt(D_k)).reshape(D, T * H)


def fast_scores(x: jax.Array, w_eff: jax.Array,
                mask: jax.Array | None = None) -> jax.Array:
    """(B, L, D), (D, TH) -> (B, L) mean softmax attention.

    Equivalent to reference transformer.py:143-148 with the fold above.
    """
    logits = jnp.einsum("bld,dc->blc", x, w_eff,
                        preferred_element_type=jnp.float32)   # (B, L, TH)
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=1)                    # over L
    return probs.mean(axis=-1)                                # over T*H


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------
#
# v2 (round 3). The v1 kernel (git history) ran one program per batch row
# with hand-rolled double-buffered DMAs, cast x UP to fp32 for the GEMM,
# and reduced the softmax over the 10k-lane axis in-kernel; it measured
# ~2x SLOWER than XLA's fused GEMM+softmax (RESULTS.md scorer table).
# v2 keeps only the part a kernel can win — streaming the (B, L, D)
# tensor through the MXU — and leaves the tiny (B, TH, L) fp32 softmax
# epilogue (~3% of the traffic) to XLA:
#
#   * grid (B, L/TL): Mosaic auto-pipelines consecutive x tiles, no
#     per-row pipeline restarts;
#   * the GEMM runs in x's own dtype (bf16 weights when x is bf16) with
#     fp32 accumulation — bf16 MXU passes, not fp32;
#   * logits land transposed as (TH_pad, TL) blocks: TH rides the
#     8-sublane axis, L the lanes, so the fp32 output tensor is
#     B*TH*L*4 bytes (~3% of x at camelyon scale) and tiles exactly.

def _logits_kernel(x_ref, w_ref, out_ref, *, TL: int, L: int):
    # Canonical MXU orientation: lhs (TL, D) with K on lanes, rhs (D,
    # TH_pad) with K on sublanes -> (TL, TH_pad); no operand transpose.
    # The tiny (TL, TH_pad) result is transposed in-VMEM (64 KB of VPU
    # shuffles, noise next to the 2 MB stream) so logits land as
    # (TH_pad, TL): TH on sublanes, L on lanes — the layout that makes
    # the XLA softmax epilogue lane-major instead of 8/128-padded.
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if L % TL:
        # Ragged L: x is NOT padded on the host (a jnp.pad would copy the
        # whole 100+ MB stream — measured 0.49 ms at camelyon scale, 70%
        # of the kernel's own runtime). The tail block reads out-of-bounds
        # garbage instead; because each acc row contracts only its own x
        # row, zeroing the out-of-range OUTPUT rows (16 K elements, ~free)
        # is exact — the epilogue then NEG_INFs those lanes.
        t = pl.program_id(1)
        idx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        acc = jnp.where(idx + t * TL < L, acc, 0.0)
    out_ref[0] = acc.T


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("TL", "interpret"))
def _pallas_logits(x: jax.Array, w: jax.Array, *, TL: int,
                   interpret: bool) -> jax.Array:
    """(B, L, D) x (D, TH_pad) -> (B, TH_pad, n_t*TL) fp32 logits.

    x is consumed UNPADDED: the grid runs ragged over L and the kernel
    zeroes out-of-range output rows, so the only L padding that ever
    exists is the aligned (tiny, fp32) logits tensor. Exposed separately
    so probes can time the streamed GEMM without the softmax epilogue.
    """
    B, L, D = x.shape
    TH_pad = w.shape[1]
    n_t = -(-L // TL)
    return pl.pallas_call(
        functools.partial(_logits_kernel, TL=TL, L=L),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, TL, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((D, TH_pad), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH_pad, TL), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, TH_pad, n_t * TL), jnp.float32),
        interpret=interpret,
    )(x, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_scores(x: jax.Array, w_eff: jax.Array,
                  mask: jax.Array | None = None,
                  interpret: bool | None = None) -> jax.Array:
    """Pallas version of fast_scores. x (B, L, D), w_eff (D, TH) -> (B, L).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests/meshes).
    When x is bf16 the folded weights are cast to bf16 too (fp32
    accumulation via preferred_element_type); rankings are insensitive at
    the tested tolerances and the bf16 stream is what makes the kernel
    HBM-roofline-bound rather than MXU-bound.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, D = x.shape
    TH = w_eff.shape[1]

    # Tile L into n_t ~2k-row tiles. TL is the sublane dim of the x block
    # AND the lane dim of the transposed output block, so it must be
    # 128-aligned; L=10000 -> 5 tiles of 2048. x itself is NEVER padded
    # (the kernel masks the ragged tail); only the tiny fp32 logits
    # tensor carries the 2.4% L padding. TH_pad rides the output sublanes.
    n_t = -(-L // 2048)
    TL = _round_up(-(-L // n_t), 128)
    L_pad = n_t * TL
    TH_pad = _round_up(TH, 8)

    if x.dtype not in (jnp.float32, jnp.bfloat16):
        x = x.astype(jnp.float32)
    # w in x's dtype: the MXU runs bf16 passes when the stream is bf16
    w = jnp.pad(w_eff.astype(x.dtype), ((0, 0), (0, TH_pad - TH)))

    logits = _pallas_logits(x, w, TL=TL, interpret=interpret)

    # Epilogue on the small transposed fp32 logits tensor (B, TH_pad,
    # L_pad): L-padding (and the user mask) fold into an additive bias so
    # every reduction runs on ALIGNED lanes — slicing L before the
    # softmax would force unaligned relayouts costing more than the
    # whole epilogue. Only the final (B, L) output is sliced.
    if TH_pad != TH:
        logits = logits[:, :TH, :]          # sublane slice, cheap
    if mask is None:
        if L_pad != L:
            bias = jnp.full((1, L_pad), 0.0, jnp.float32)
            bias = bias.at[:, L:].set(NEG_INF)
            logits = logits + bias[:, None, :]
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        if L_pad != L:
            bias = jnp.pad(bias, ((0, 0), (0, L_pad - L)),
                           constant_values=NEG_INF)
        logits = logits + bias[:, None, :]
    probs = jax.nn.softmax(logits, axis=-1)   # over L_pad lanes
    return probs.mean(axis=1)[:, :L]
