"""IPSModel — encoder + cross-attention transformer + per-task heads.

The reference packs these into one stateful ``IPSNet`` nn.Module that flips
train/eval modes in place during selection (reference
architecture/ips_net.py:11-283). Here the model is a single pure flax module
with *methods* used by the functional selection/training engines:

  * ``encode``    — patch/feature -> D-dim embedding (the only part that
                    touches conv/BatchNorm state)
  * ``scores``    — deterministic per-candidate saliency
                    (reference ips_net.py:136-155 + transformer.py:143-148)
  * ``aggregate`` — cross-attention pooling -> (B, n_token, D)
  * ``predict``   — per-task heads: Linear -> softmax/sigmoid
                    (reference ips_net.py:62-83,157-166)
  * ``__call__``  — full gradient-mode forward over the M selected patches
                    (reference ips_net.py:264-283)

Selection-time eval semantics (frozen BatchNorm statistics, no dropout;
reference ips_net.py:190-193) fall out for free: the selection engine calls
``encode``/``scores`` with ``train=False`` and without mutable batch_stats.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from ips_tpu.config import Config
from ips_tpu.models.encoders import (ConvPatchEncoder, FeatureProjector,
                                     encoder_out_dim)
from ips_tpu.models.transformer import CrossAttnTransformer, torch_linear_init

from ips_tpu.utils.imagenet import IMAGENET_MEAN, IMAGENET_STD


class IPSModel(nn.Module):
    conf: Config

    def setup(self):
        c = self.conf
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        if c.is_image:
            d_enc = encoder_out_dim(c.enc_type, c.n_res_blocks)
            if d_enc != c.D:
                raise ValueError(
                    f"encoder output dim {d_enc} != D={c.D}; the reference "
                    "relies on these matching (ips_net.py:209-210)")
            self.encoder = ConvPatchEncoder(
                enc_type=c.enc_type, n_chan_in=c.n_chan_in,
                n_res_blocks=c.n_res_blocks, s2d_stem=c.s2d_stem,
                dtype=dtype, name="encoder")
        else:
            self.encoder = FeatureProjector(
                n_chan_in=c.n_chan_in, D=c.D, dtype=dtype,
                ln_fold=c.ln_fold, name="encoder")
        self.transf = CrossAttnTransformer(
            n_token=c.n_token, H=c.H, D=c.D, D_k=c.D_k, D_v=c.D_v,
            D_inner=c.D_inner, attn_dropout=c.attn_dropout, dropout=c.dropout,
            dtype=dtype, name="transf")
        heads = {}
        for task in c.task_list:
            heads[task.name] = nn.Dense(
                c.n_class, kernel_init=torch_linear_init(c.D),
                bias_init=torch_linear_init(c.D), name=f"head_{task.name}")
        self.heads = heads

    # -- pieces used by the selection engine --------------------------------
    def encode(self, x: jax.Array, train: bool = False,
               weights: Optional[jax.Array] = None) -> jax.Array:
        """Encode patches: (B, n, ph, pw, C) or (B, n, F) -> (B, n, D).

        uint8 patches (raw image tiles kept compact in HBM) are scaled to
        [0, 1] here, per chunk — the resident (B, N, ...) tensor stays
        uint8 so selection over raw tiles costs 1/4 the memory of fp32.
        `weights` (B,) keeps zero-padded instances out of BatchNorm batch
        statistics during training (see ips_tpu/models/norm.py).
        """
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        if self.conf.input_norm == "imagenet":
            # on-device normalization: datasets ship raw [0,1]/uint8 RGB
            # (reference normalizes on host, traffic_dataset.py:275-290)
            x = (x.astype(jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD
        lead = x.shape[:2]
        flat = x.reshape((lead[0] * lead[1],) + x.shape[2:])
        row_w = (jnp.repeat(weights, lead[1]) if weights is not None
                 else None)
        emb = self.encoder(flat, train=train, row_weights=row_w)
        return emb.reshape(lead + (self.conf.D,))

    def scores(self, emb: jax.Array,
               mask: Optional[jax.Array] = None) -> jax.Array:
        """Deterministic saliency scores (B, L) from embeddings (B, L, D).

        Dispatches on conf.score_impl; 'fast' and 'pallas' fold the query
        tokens into the key projection so the whole scorer is one GEMM
        (ips_tpu/ops/score_kernel.py) — numerically identical to the
        reference-shaped 'attn' path.
        """
        impl = self.conf.score_impl
        if impl == "attn":
            return self.transf.get_scores(emb, mask)
        from ips_tpu.ops.score_kernel import (fast_scores, fold_query,
                                              pallas_scores)
        att = self.transf.crs_attn
        w_eff = fold_query(att.q, att.q_w.variables["params"]["kernel"],
                           att.k_w.variables["params"]["kernel"],
                           self.conf.H, self.conf.D_k)
        emb = emb.astype(jnp.float32)
        if impl == "pallas":
            return pallas_scores(emb, w_eff, mask)
        return fast_scores(emb, w_eff, mask)

    def aggregate(self, emb: jax.Array, mask: Optional[jax.Array] = None,
                  train: bool = False) -> jax.Array:
        return self.transf(emb, mask=mask, deterministic=not train)

    def predict(self, image_emb: jax.Array) -> Dict[str, jax.Array]:
        """Per-task prediction from the (B, n_token, D) aggregate."""
        preds = {}
        for task in self.conf.task_list:
            logit = self.heads[task.name](image_emb[:, task.id])
            if task.act_fn == "softmax":
                preds[task.name] = jax.nn.softmax(logit, axis=-1)
            else:
                preds[task.name] = jax.nn.sigmoid(logit)
        return preds

    # -- full gradient-mode forward (reference ips_net.py:264-283) ----------
    def __call__(self, mem_patch: jax.Array,
                 mem_pos: Optional[jax.Array] = None,
                 mem_mask: Optional[jax.Array] = None,
                 train: bool = False,
                 weights: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        emb = self.encode(mem_patch, train=train, weights=weights)
        if mem_pos is not None:
            emb = emb + mem_pos
        image_emb = self.aggregate(emb, mask=mem_mask, train=train)
        return self.predict(image_emb)


def _dummy_patch(conf: Config) -> jnp.ndarray:
    if conf.is_image:
        ph, pw = conf.patch_size
        return jnp.zeros((1, 1, ph, pw, conf.n_chan_in), jnp.float32)
    return jnp.zeros((1, 1, conf.n_chan_in), jnp.float32)


def init_ips_model(conf: Config, rng: jax.Array
                   ) -> Tuple[IPSModel, FrozenDict, FrozenDict]:
    """Build the model and initialize (params, batch_stats)."""
    model = IPSModel(conf)
    pos = (jnp.zeros((1, 1, conf.D), jnp.float32) if conf.use_pos else None)
    variables = model.init({"params": rng}, _dummy_patch(conf), pos,
                           None, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return model, params, batch_stats
