"""Learnable-query cross-attention transformer (aggregator + patch scorer).

Behavioral parity notes (vs reference architecture/transformer.py):
  * learnable query tokens ``q`` of shape (1, n_token, D), init
    U(-sqrt(1/D_k), sqrt(1/D_k))            (reference transformer.py:54-56)
  * q/k/v/out projections have no bias      (reference transformer.py:58-61)
  * attention = softmax(q k^T / sqrt(D_k)), dropout on the attention matrix
                                            (reference transformer.py:29-34)
  * residual adds the *raw* query parameter (not the attention input), then
    LayerNorm(eps=1e-6)                     (reference transformer.py:106-107)
  * two-layer MLP with ReLU, dropout, residual, LayerNorm(eps=1e-6)
                                            (reference transformer.py:111-132)
  * patch saliency = attention averaged over heads, then over tokens
                                            (reference transformer.py:143-148)

TPU-native differences: everything is fixed-shape and mask-aware (padded
candidates receive a large negative logit so they take no softmax mass —
needed because the selection loop runs over padded chunks), scores are
always computed deterministically (the reference flips modules to .eval()
during selection, reference ips_net.py:190-193), and matmuls run in a
configurable compute dtype with fp32 softmax accumulation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ips_tpu.constants import NEG_INF


def pos_enc_1d_np(D: int, len_seq: int):
    """Host (numpy) sin/cos positional table, (len_seq, D).

    Matches reference transformer.py:6-18 (sin on even dims, cos on odd).
    Computed on the host so jitted closures embed it as a constant instead
    of reading a device buffer back at trace time.
    """
    import numpy as np
    if D % 2 != 0:
        raise ValueError(f"pos_enc_1d needs even D, got {D}")
    position = np.arange(len_seq, dtype=np.float32)[:, None]            # (L, 1)
    div_term = np.exp(np.arange(0, D, 2, dtype=np.float32)
                      * -(math.log(10000.0) / D))                       # (D/2,)
    ang = position * div_term                                           # (L, D/2)
    pe = np.stack([np.sin(ang), np.cos(ang)], axis=-1)                  # (L, D/2, 2)
    return pe.reshape(len_seq, D).astype(np.float32)


def pos_enc_1d(D: int, len_seq: int, dtype=jnp.float32) -> jax.Array:
    """Device version of pos_enc_1d_np."""
    return jnp.asarray(pos_enc_1d_np(D, len_seq), dtype)


def torch_linear_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch.nn.Linear's default bound."""
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class MultiHeadCrossAttention(nn.Module):
    """Multi-head cross-attention with learnable query tokens."""

    n_token: int
    H: int
    D: int
    D_k: int
    D_v: int
    attn_dropout: float = 0.1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        q_bound = math.sqrt(1.0 / self.D_k)
        self.q = self.param(
            "q",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -q_bound, q_bound),
            (1, self.n_token, self.D))
        lin = torch_linear_init(self.D)
        self.q_w = nn.Dense(self.H * self.D_k, use_bias=False,
                            kernel_init=lin, dtype=self.dtype, name="q_w")
        self.k_w = nn.Dense(self.H * self.D_k, use_bias=False,
                            kernel_init=lin, dtype=self.dtype, name="k_w")
        self.v_w = nn.Dense(self.H * self.D_v, use_bias=False,
                            kernel_init=lin, dtype=self.dtype, name="v_w")
        self.fc = nn.Dense(self.D, use_bias=False,
                           kernel_init=torch_linear_init(self.H * self.D_v),
                           dtype=self.dtype, name="fc")
        self.attn_drop = nn.Dropout(self.attn_dropout)
        self.out_drop = nn.Dropout(self.dropout)
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, name="layer_norm")

    def _attn_logits(self, x: jax.Array) -> jax.Array:
        """(B, L, D) -> logits (B, H, n_token, L), fp32."""
        B, L = x.shape[:2]
        q = self.q_w(self.q).reshape(1, self.n_token, self.H, self.D_k)
        k = self.k_w(x).reshape(B, L, self.H, self.D_k)
        q = jnp.transpose(q, (0, 2, 1, 3))            # (1, H, T, Dk)
        k = jnp.transpose(k, (0, 2, 1, 3))            # (B, H, L, Dk)
        logits = jnp.einsum("xhtd,bhld->bhtl", q, k,
                            preferred_element_type=jnp.float32)
        return logits / math.sqrt(self.D_k)

    def attn_weights(self, x: jax.Array,
                     mask: Optional[jax.Array] = None) -> jax.Array:
        """Deterministic attention weights (B, H, n_token, L).

        mask: optional (B, L) bool; False entries get ~zero attention.
        """
        logits = self._attn_logits(x)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
        return jax.nn.softmax(logits, axis=-1)

    def get_scores(self, x: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
        """Per-patch saliency (B, L): attention averaged over heads then tokens."""
        attn = self.attn_weights(x, mask)             # (B, H, T, L)
        return attn.mean(axis=1).mean(axis=1)         # == mean over H then T

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        B, L = x.shape[:2]
        logits = self._attn_logits(x)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = self.attn_drop(attn, deterministic=deterministic)
        v = self.v_w(x).reshape(B, L, self.H, self.D_v)
        v = jnp.transpose(v, (0, 2, 1, 3))            # (B, H, L, Dv)
        out = jnp.einsum("bhtl,bhld->bhtd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, self.n_token,
                                                       self.H * self.D_v)
        out = self.fc(out.astype(self.dtype))
        out = self.out_drop(out, deterministic=deterministic)
        # Residual on the raw learnable query (reference transformer.py:106).
        out = out.astype(jnp.float32) + self.q
        return self.layer_norm(out)


class MLP(nn.Module):
    """Two-layer feed-forward with residual + LayerNorm."""

    D: int
    D_inner: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        residual = x
        h = nn.Dense(self.D_inner, kernel_init=torch_linear_init(self.D),
                     bias_init=torch_linear_init(self.D), dtype=self.dtype,
                     name="w_1")(x)
        h = jax.nn.relu(h)
        h = nn.Dense(self.D, kernel_init=torch_linear_init(self.D_inner),
                     bias_init=torch_linear_init(self.D_inner),
                     dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h.astype(jnp.float32) + residual
        return nn.LayerNorm(epsilon=1e-6, name="layer_norm")(h)


class CrossAttnTransformer(nn.Module):
    """One cross-attention block + MLP; doubles as scorer and aggregator."""

    n_token: int
    H: int
    D: int
    D_k: int
    D_v: int
    D_inner: int
    attn_dropout: float = 0.1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.crs_attn = MultiHeadCrossAttention(
            n_token=self.n_token, H=self.H, D=self.D, D_k=self.D_k,
            D_v=self.D_v, attn_dropout=self.attn_dropout, dropout=self.dropout,
            dtype=self.dtype, name="crs_attn")
        self.mlp = MLP(D=self.D, D_inner=self.D_inner, dropout=self.dropout,
                       dtype=self.dtype, name="mlp")

    def get_scores(self, x: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
        """(B, L, D) -> (B, L) deterministic saliency scores."""
        return self.crs_attn.get_scores(x, mask)

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """(B, L, D) -> (B, n_token, D) aggregated image embedding."""
        h = self.crs_attn(x, mask=mask, deterministic=deterministic)
        return self.mlp(h, deterministic=deterministic)
