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
  * ``pallas_scores`` — one Pallas kernel per batch row: double-buffered
    HBM->VMEM streaming of x tiles, MXU matmul into a VMEM logits scratch,
    then in-kernel masked softmax (fp32) and T*H-mean. Demonstrates the
    full selection scorer at speed-of-light HBM bandwidth; numerics match
    ``fast_scores`` to float tolerance (tests/test_score_kernel.py).

Both are exactly equivalent to the reference attention-mean scoring.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

def _score_kernel(x_hbm, w_ref, bias_ref, out_ref, logits_ref, x_tile,
                  sems, *, L: int, TL: int, TH: int):
    """One batch row: stream x in (TL, D) tiles, GEMM into a transposed
    (TH, L) logits scratch (TH rides the 8-sublane axis, L the lanes),
    then masked softmax over L and mean over TH."""
    n_tiles = L // TL
    b = pl.program_id(0)

    def get_dma(slot, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile_idx * TL, TL), :],
            x_tile.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def tile_body(i, _):
        slot = i % 2

        @pl.when(i + 1 < n_tiles)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        # (TH, D) x (TL, D) contracted over D on the MXU -> (TH, TL).
        # x streams in its native dtype (bf16 halves the HBM traffic);
        # the cast to the weight dtype happens VMEM->registers, free
        # relative to the stream.
        logits_ref[:, pl.ds(i * TL, TL)] = jax.lax.dot_general(
            w_ref[:], x_tile[slot].astype(w_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    # masked softmax over L (lanes), fp32; bias is 0 or NEG_INF per slot
    logits = logits_ref[:] + bias_ref[0, 0, :][None, :]        # (TH, L)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    out_ref[0, 0, :] = jnp.mean(e / s, axis=0).astype(out_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_scores(x: jax.Array, w_eff: jax.Array,
                  mask: jax.Array | None = None,
                  interpret: bool | None = None) -> jax.Array:
    """Pallas version of fast_scores. x (B, L, D), w_eff (D, TH) -> (B, L).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests/meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, D = x.shape
    TH = w_eff.shape[1]

    TL = 2048 if L >= 2048 else _round_up(L, 128)
    L_pad = _round_up(L, TL)
    TH_pad = _round_up(TH, 8)   # TH rides the sublane axis in-kernel

    if x.dtype not in (jnp.float32, jnp.bfloat16):
        x = x.astype(jnp.float32)
    if L_pad != L:
        x = jnp.pad(x, ((0, 0), (0, L_pad - L), (0, 0)))
    # kernel consumes W transposed: (TH_pad, D)
    w = jnp.pad(w_eff.astype(jnp.float32).T,
                ((0, TH_pad - TH), (0, 0)))
    # additive bias: padded L rows and padded TH cols masked out
    if mask is None:
        bias = jnp.zeros((B, L_pad), jnp.float32)
        if L_pad != L:
            bias = bias.at[:, L:].set(NEG_INF)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        if L_pad != L:
            bias = jnp.pad(bias, ((0, 0), (0, L_pad - L)),
                           constant_values=NEG_INF)

    # padded TH columns would contribute garbage to the mean: instead of
    # masking columns in-kernel, zero their W_eff so their logits are 0
    # everywhere -> uniform softmax; correct by rescaling after the call.
    bias3 = bias[:, None, :]
    probs = pl.pallas_call(
        functools.partial(_score_kernel, L=L_pad, TL=TL, TH=TH_pad),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM; manual DMA
            pl.BlockSpec((TH_pad, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, L_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH_pad, L_pad), jnp.float32),   # transposed logits
            pltpu.VMEM((2, TL, D), x.dtype),            # x double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w, bias3)
    probs = probs[:, 0, :]

    if TH_pad != TH:
        # padded cols carried a uniform 1/L' distribution over unmasked
        # rows; correct the mean: probs = (TH*true_mean + pad*uniform)/TH'
        n_valid = jnp.maximum(jnp.sum(bias[:, :L] == 0.0, axis=1,
                                      keepdims=True), 1)
        uniform = jnp.where(bias[:, :L] == 0.0, 1.0 / n_valid, 0.0)
        probs = (probs[:, :L] * TH_pad - (TH_pad - TH) * uniform) / TH
        return probs
    return probs[:, :L]
