"""Jitted training/eval/selection steps.

The reference interleaves selection (no-grad, eval-mode) and training
(grad, train-mode) through in-place module mode flips
(reference architecture/ips_net.py:190-193,254-259 and
training/iterative.py:103-189). Here each phase is a separate pure, jitted
function over one set of parameters:

  * ``select``      — IPS over a loader batch (B_seq); always deterministic,
                      never differentiated.
  * ``train_step``  — gradient forward over the assembled (B, M) memory
                      batch: dropout on, BatchNorm batch-stats updated,
                      AdamW(wd over all params, torch semantics) update with
                      an explicitly injected per-step learning rate
                      (reference main.py:57, utils/utils.py:14-31).
  * ``eval_step``   — same forward, eval mode, no grad
                      (reference training/iterative.py:193-231).
  * ``fused_step``  — selection + train in ONE jit for the B_seq == B fast
                      path: no host round-trip between IPS and the update,
                      XLA overlaps both phases.

Partial final batches are handled with per-instance weights instead of the
reference's shape-changing ``shrink_batch`` (training/iterative.py:52-63),
so every step compiles exactly once.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ips_tpu.config import Config
from ips_tpu.models.ips_net import IPSModel, init_ips_model
from ips_tpu.models.transformer import pos_enc_1d_np
from ips_tpu.ops.selection import ips_select


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def compute_task_losses(conf: Config, preds: Dict[str, jax.Array],
                        labels: Dict[str, jax.Array],
                        weights: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-task losses averaged into one scalar.

    softmax tasks: NLL of log(pred + eps) — reference training/iterative.py:84
    sigmoid tasks: BCE over flattened outputs — reference training/iterative.py:87-88
    Mean over tasks — reference training/iterative.py:96-98.
    `weights` (B,) in {0,1} masks padded instances of a partial batch.
    """
    w_sum = jnp.maximum(weights.sum(), 1.0)
    task_losses = {}
    total = 0.0
    for task in conf.task_list:
        pred = preds[task.name]
        label = labels[task.name]
        if task.act_fn == "softmax":
            logp = jnp.log(pred + conf.eps)                       # (B, C)
            nll = -jnp.take_along_axis(
                logp, label.astype(jnp.int32)[:, None], axis=1)[:, 0]
            tl = (nll * weights).sum() / w_sum
        else:
            p = pred.reshape(pred.shape[0], -1)
            y = label.reshape(label.shape[0], -1).astype(jnp.float32)
            p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
            bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))   # (B, k)
            tl = (bce.mean(axis=-1) * weights).sum() / w_sum
        task_losses[task.name] = tl
        total = total + tl
    return total / len(conf.task_list), task_losses


class IPSTrainer:
    """Owns model/optimizer and the compiled step functions."""

    def __init__(self, conf: Config, rng: Optional[jax.Array] = None,
                 init_opt: bool = True):
        """init_opt=False skips AdamW state allocation (two param-sized
        moment trees) for inference-only use (ips_tpu/infer.py)."""
        self.conf = conf
        rng = rng if rng is not None else jax.random.PRNGKey(conf.seed)
        self.model, params, batch_stats = init_ips_model(conf, rng)
        if conf.is_image and conf.pretrained and not conf.pretrained_path:
            raise ValueError(
                "pretrained=True requires pretrained_path: this environment "
                "cannot download torchvision weights — convert a local "
                "checkpoint with `python -m ips_tpu.models.pretrained "
                "resnet.pth weights.npz` and set pretrained_path, or set "
                "pretrained=false")
        if conf.is_image and conf.pretrained and conf.pretrained_path:
            # ImageNet-style initialization (reference ips_net.py:20-27)
            # from a locally converted checkpoint (no network egress here).
            # The stem kernel is deliberately re-initialized when the input
            # is not 3-channel — the reference swaps conv1 AFTER loading
            # ImageNet weights (reference ips_net.py:29-31); every other
            # mismatch or uncovered encoder variable fails loudly.
            from ips_tpu.models.pretrained import load_encoder_npz
            stem_skip = (("params/conv1/kernel",)
                         if conf.n_chan_in != 3 else ())
            merged = load_encoder_npz(
                conf.pretrained_path,
                {"params": params, "batch_stats": batch_stats},
                prefix="encoder/", skip_keys=stem_skip, expect_cover=True)
            params, batch_stats = merged["params"], merged["batch_stats"]
        # AdamW with torch parity: betas (0.9, 0.999), eps 1e-8, weight decay
        # applied to every parameter (reference main.py:57).
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=conf.wd)
        self.state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params) if init_opt else None,
            step=jnp.zeros((), jnp.int32))
        # kept as a HOST constant: jit traces embed it directly instead of
        # reading a device buffer back at trace time (the remote-TPU
        # device->host path is slow and can fail mid-trace)
        self.pos_table = (pos_enc_1d_np(conf.D, conf.N)
                          if conf.use_pos else None)  # config validates N>0

        self._select = jax.jit(self._select_impl)
        self._streaming = None
        self._densify = jax.jit(self._densify_impl,
                                static_argnames=("img_hw",))
        donate = (0,) if conf.donate_buffers else ()
        self._train = jax.jit(self._train_impl, donate_argnums=donate)
        self._eval = jax.jit(self._eval_impl)
        self._fused = jax.jit(self._fused_impl, donate_argnums=donate)

    # -- device placement ---------------------------------------------------
    def put_batch(self, tree, patch_dim=None):
        """Device-placement hook for loader batches.

        Single-device trainers issue one async jax.device_put here (so the
        prefetch pipeline's transfers start at prepare time, not at step
        dispatch); ShardedIPSTrainer overrides this to shard dim 0 over
        the `data` mesh axis (and `patch_dim` over `patch`) so
        host->device transfers land directly in their final layout.
        Callers pass HOST arrays — staging through the default device
        first would double the transfer under a mesh.
        """
        return jax.device_put(tree)

    def put_replicated(self, tree):
        """Place small per-step values (rng keys). Overridden under a
        multi-host mesh to build replicated global arrays."""
        return jax.device_put(tree)

    def _stream_sharding(self, x):
        """Sharding for streamed selection chunks (None = default device)."""
        return None

    def _stream_group_sharding(self, x):
        """Sharding for a stacked (G, B, I, ...) chunk group (None =
        default device); the mesh trainer replicates the scan axis and
        shards the inner dims like a single chunk."""
        return None

    def _stream_out_sharding(self, x):
        """Sharding for the streamed selection's OUTPUTS — the (B, M, ...)
        memory batch the train/eval steps consume (data axis only under a
        mesh: those steps' in_shardings expect it)."""
        return None

    # -- closures over apply ------------------------------------------------
    def _enc_score_fns(self, params, batch_stats):
        """(encode, score) closures for the SELECTION pass only.

        With conf.select_dtype == 'int8' the encoder runs int8-quantized
        (ips_tpu/models/quant.py) — safe because selection only *ranks*
        patches and its embeddings are discarded; the training forward
        always re-encodes the survivors in full precision.
        """
        variables = {"params": params, "batch_stats": batch_stats}
        model = self.model

        if self.conf.select_dtype == "int8" and self.conf.is_image:
            from ips_tpu.models.quant import make_quant_encode_fn
            encode = make_quant_encode_fn(params, batch_stats, self.conf)
        else:
            def encode(x):
                return model.apply(variables, x, train=False,
                                   method=IPSModel.encode)

        def score(emb, mask):
            return model.apply(variables, emb, mask, method=IPSModel.scores)

        return encode, score

    def _selection_encode_wrap(self):
        """Optional (encode_fn, x) -> emb placement wrapper for selection
        encodes. None on a single device; ShardedIPSTrainer returns the
        exact-CP wrapper (shard the chunk's patch axis for the encode,
        replicate the embeddings for scoring) when mesh_patch > 1."""
        return None

    # -- selection ----------------------------------------------------------
    def _pos_table_const(self):
        """Host pos table -> in-trace constant (no device read at trace)."""
        return (jnp.asarray(self.pos_table) if self.pos_table is not None
                else None)

    def _resolve_preencode(self, patches) -> bool:
        """Resolve conf.preencode_select='auto' per input shape.

        Enabled when the resident (B, N, ...) patch table exceeds VMEM
        (~128 MB on v5e): beyond that, the selection scan's per-chunk
        patch-row gathers fall out of VMEM and run at ~10 GB/s effective
        (the round-2 "large-N cliff" — attributed by
        scripts/probe_largeN.py: gather-vs-slice chunk encodes are 2x
        apart at N=3600, trace shows 72 of 141 ms in one gather fusion at
        10 GB/s), while pre-encoding gathers compact (N, D) embedding rows
        instead. Measured: 147.7 -> 90.4 ms at N=3600 (-39%). Below the
        threshold the whole table lives in VMEM, gathers are free, and
        pre-encoding is neutral — it stays off (the N=900 bench shape)."""
        pe = self.conf.preencode_select
        if pe != "auto":
            return bool(pe)
        B, N = patches.shape[:2]
        if self.conf.M >= N:
            return False          # shortcut path encodes nothing per chunk
        row_elems = 1
        for d in patches.shape[2:]:
            row_elems *= int(d)
        table_bytes = B * N * row_elems * patches.dtype.itemsize
        return table_bytes > 96 * 2**20

    def _select_impl(self, params, batch_stats, patches, mask, rng,
                     preencode=None, return_emb=False):
        """preencode=None resolves conf.preencode_select against this
        input's shape; vmapped callers (the assembled path) pass the
        resolution computed on the TOTAL stacked shape — inside the vmap
        the per-slice table looks VMEM-sized while the real resident
        tensor is r x bigger.

        return_emb=True additionally returns the buffer's raw (B, M, D)
        embeddings as a 5th output — eval/inference reuse them instead of
        re-encoding (conf.eval_reuse_emb); any unused outputs (e.g. the
        mem_patch gather on that path) are DCE'd by XLA."""
        conf = self.conf
        if conf.input_dtype == "bfloat16" and patches.dtype != jnp.uint8:
            # one up-front cast: halves HBM traffic of every chunk gather
            # (uint8 tiles are already compact and convert per-chunk)
            patches = patches.astype(jnp.bfloat16)
        encode, score = self._enc_score_fns(params, batch_stats)
        if preencode is None:
            preencode = self._resolve_preencode(patches)
        res = ips_select(
            encode, score, patches, M=conf.M, I=conf.I,
            pos_table=self._pos_table_const(), mask=mask, rng=rng,
            shuffle=conf.shuffle, shuffle_style=conf.shuffle_style,
            preencode=preencode,
            # conv encoders pre-encode in I-sized chunks: a one-shot encode
            # would materialize every intermediate activation for B*N
            # patches at once (GBs at camelyon-e2e scale); the projector
            # (feature mode) has no spatial blow-up and keeps the faster
            # single dispatch
            preencode_chunked=conf.is_image,
            unroll=conf.select_unroll,
            encode_wrap=self._selection_encode_wrap(),
            return_emb=return_emb)
        if return_emb:
            return (res.mem_patch, res.mem_pos, res.mem_idx, res.mem_mask,
                    res.mem_emb)
        return res.mem_patch, res.mem_pos, res.mem_idx, res.mem_mask

    def select(self, patches, mask=None, rng=None):
        """Run IPS for one loader batch. patches: (B_seq, N, ...)."""
        B, N = patches.shape[:2]
        if mask is None:
            mask = jnp.ones((B, N), dtype=bool)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._select(self.state.params, self.state.batch_stats,
                            patches, mask, rng)

    def _densify_impl(self, flat_idx, values, img_hw):
        conf = self.conf
        from ips_tpu.ops.densify import densify_patches
        out_dtype = (jnp.bfloat16 if conf.input_dtype == "bfloat16"
                     else jnp.float32)
        return densify_patches(flat_idx, values, img_hw, conf.patch_size,
                               n_chan=conf.n_chan_in, out_dtype=out_dtype)

    def densify(self, flat_idx, values, img_hw):
        """Device-side sparse -> patch tensor (conf.sparse_input path)."""
        return self._densify(jnp.asarray(flat_idx), jnp.asarray(values),
                             img_hw=tuple(img_hw))

    def select_streaming(self, patches, mask=None, rng=None,
                         return_emb=False):
        """Lazy-mode IPS: patches stay in host RAM, chunks stream to HBM
        (reference `eager: false`, ips_net.py:223). return_emb=True adds
        the buffer's (B, M, D) embeddings as a 5th output (None on the
        M >= N shortcut, which never encodes)."""
        import numpy as np

        from ips_tpu.train.streaming import StreamingSelector
        if self._streaming is None:
            self._streaming = StreamingSelector(self)
        return self._streaming.select(np.asarray(patches), mask, rng,
                                      return_emb=return_emb)

    # -- gradient step ------------------------------------------------------
    def _loss_and_aux(self, params, batch_stats, mem_patch, mem_pos, mem_mask,
                      labels, weights, dropout_rng):
        conf = self.conf
        attn_mask = mem_mask if conf.mask_padding else None
        if conf.grad_encode_chunk or conf.remat_encode:
            preds, new_bs = self._grad_forward(
                params, batch_stats, mem_patch, mem_pos, attn_mask, weights,
                dropout_rng)
        else:
            preds, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                mem_patch, mem_pos, attn_mask, train=True, weights=weights,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        loss, task_losses = compute_task_losses(conf, preds, labels, weights)
        return loss, (task_losses, preds, new_bs)

    def _grad_forward(self, params, batch_stats, mem_patch, mem_pos,
                      attn_mask, weights, dropout_rng):
        """Gradient-mode forward with bounded encoder activation memory.

        ``remat_encode`` wraps the train-mode encode in ``jax.checkpoint``:
        the backward recomputes the encoder forward instead of stashing its
        activations across the aggregation transformer — exact.
        ``grad_encode_chunk=c`` additionally ``lax.scan``s the encode over
        (B, c, ...) slices of the M selected patches with rematerialized
        bodies, so train-side activation memory is O(one chunk) — the
        gradient analog of the selection engine's chunked pre-encode (the
        reference re-encodes all M in one conv forward, ips_net.py:264-283).
        Chunked train-mode BatchNorm computes batch statistics per chunk
        (ghost batch norm; running averages update per chunk, in order).
        A ``len(M) % c`` tail encodes as one smaller chunk, so no padded
        patch row ever reaches BatchNorm statistics.
        """
        model, conf = self.model, self.conf

        def enc(bs, x):
            emb, mut = model.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                weights=weights, method=IPSModel.encode,
                mutable=["batch_stats"])
            return mut["batch_stats"], emb

        B, M = mem_patch.shape[:2]
        c = conf.grad_encode_chunk
        remat_enc = jax.checkpoint(enc)
        if c and c < M:
            n_full, tail = divmod(M, c)
            main = mem_patch[:, :M - tail].reshape(
                (B, n_full, c) + mem_patch.shape[2:])
            new_bs, embs = jax.lax.scan(remat_enc, batch_stats,
                                        jnp.swapaxes(main, 0, 1))
            emb = jnp.swapaxes(embs, 0, 1).reshape(B, M - tail, conf.D)
            if tail:
                new_bs, emb_tail = remat_enc(new_bs, mem_patch[:, M - tail:])
                emb = jnp.concatenate([emb, emb_tail], axis=1)
        else:
            new_bs, emb = remat_enc(batch_stats, mem_patch)
        if mem_pos is not None:
            emb = emb + mem_pos
        variables = {"params": params, "batch_stats": new_bs}
        image_emb = model.apply(variables, emb, attn_mask, True,
                                method=IPSModel.aggregate,
                                rngs={"dropout": dropout_rng})
        preds = model.apply(variables, image_emb, method=IPSModel.predict)
        return preds, new_bs

    def _train_impl(self, state: TrainState, mem_patch, mem_pos, mem_mask,
                    labels, weights, rng, lr):
        grad_fn = jax.value_and_grad(self._loss_and_aux, has_aux=True)
        (loss, (task_losses, preds, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, mem_patch, mem_pos, mem_mask,
            labels, weights, rng)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = self.tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, loss, task_losses, preds

    def _require_opt(self):
        if self.state.opt_state is None:
            raise RuntimeError(
                "trainer was built with init_opt=False (inference-only); "
                "training steps need optimizer state")

    def train_step(self, mem_patch, mem_pos, mem_mask, labels, weights, rng,
                   lr: float):
        self._require_opt()
        self.state, loss, task_losses, preds = self._train(
            self.state, mem_patch, mem_pos, mem_mask, labels, weights, rng,
            jnp.asarray(lr, jnp.float32))
        return loss, task_losses, preds

    # -- eval ---------------------------------------------------------------
    def _eval_impl(self, params, batch_stats, mem_patch, mem_pos, mem_mask,
                   labels, weights):
        conf = self.conf
        attn_mask = mem_mask if conf.mask_padding else None
        preds = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            mem_patch, mem_pos, attn_mask, train=False)
        loss, task_losses = compute_task_losses(conf, preds, labels, weights)
        return loss, task_losses, preds

    def eval_step(self, mem_patch, mem_pos, mem_mask, labels, weights):
        return self._eval(self.state.params, self.state.batch_stats,
                          mem_patch, mem_pos, mem_mask, labels, weights)

    def _jit_eval_from_emb(self):
        """jit factory for the embedding-reuse eval (overridden under a
        mesh)."""
        return jax.jit(self._eval_from_emb_impl)

    def eval_from_emb_step(self, mem_emb, mem_pos, mem_mask, labels,
                           weights):
        """Eval forward from the selection buffer's embeddings (streaming
        eval path; see _reuse_eval_emb)."""
        if not hasattr(self, "_eval_emb"):
            self._eval_emb = self._jit_eval_from_emb()
        return self._eval_emb(self.state.params, self.state.batch_stats,
                              mem_emb, mem_pos, mem_mask, labels, weights)

    def _reuse_eval_emb(self) -> bool:
        """Eval/inference may consume the selection buffer's embeddings
        directly: selection runs the encoder in the SAME eval mode (frozen
        batch statistics, no dropout) the eval forward would, so the
        reference's re-encode of the M survivors (architecture/
        ips_net.py:264-283) recomputes identical values there. int8
        selection keeps the re-encode — its buffer is quantized."""
        return self.conf.eval_reuse_emb and self.conf.select_dtype != "int8"

    def _eval_from_emb_impl(self, params, batch_stats, mem_emb, mem_pos,
                            mem_mask, labels, weights):
        """Eval forward from precomputed eval-mode embeddings: skips the
        (B, M, ...) patch gather and the whole encoder pass."""
        conf = self.conf
        attn_mask = mem_mask if conf.mask_padding else None
        variables = {"params": params, "batch_stats": batch_stats}
        emb = mem_emb if mem_pos is None else mem_emb + mem_pos
        image_emb = self.model.apply(variables, emb, attn_mask, False,
                                     method=IPSModel.aggregate)
        preds = self.model.apply(variables, image_emb,
                                 method=IPSModel.predict)
        loss, task_losses = compute_task_losses(conf, preds, labels, weights)
        return loss, task_losses, preds

    def _fused_eval_impl(self, params, batch_stats, patches, mask, labels,
                         weights, rng):
        if self._reuse_eval_emb():
            _, mem_pos, _, mem_mask, mem_emb = self._select_impl(
                params, batch_stats, patches, mask, rng, return_emb=True)
            return self._eval_from_emb_impl(params, batch_stats, mem_emb,
                                            mem_pos, mem_mask, labels,
                                            weights)
        mem_patch, mem_pos, _, mem_mask = self._select_impl(
            params, batch_stats, patches, mask, rng)
        return self._eval_impl(params, batch_stats, mem_patch, mem_pos,
                               mem_mask, labels, weights)

    def _jit_fused_eval(self):
        """jit factory for the fused eval step (overridden under a mesh)."""
        return jax.jit(self._fused_eval_impl)

    def fused_eval_step(self, patches, mask, labels, weights, rng):
        """Selection + eval forward in one jit (B_seq == B fast path)."""
        if not hasattr(self, "_fused_eval"):
            self._fused_eval = self._jit_fused_eval()
        return self._fused_eval(self.state.params, self.state.batch_stats,
                                patches, mask, labels, weights, rng)

    def _fused_eval_multi_impl(self, params, batch_stats, patches, mask,
                               labels, weights, rngs):
        """K fused select+eval batches in one dispatch (lax.scan over the
        leading batch axis; params are loop constants — eval carries no
        state)."""
        def body(carry, xs):
            out = self._fused_eval_impl(params, batch_stats, xs["p"],
                                        xs["m"], xs["lab"], xs["w"],
                                        xs["rng"])
            return carry, out

        xs = {"p": patches, "m": mask, "lab": labels, "w": weights,
              "rng": rngs}
        _, (losses, task_losses, preds) = jax.lax.scan(
            body, jnp.zeros(()), xs)
        return losses, task_losses, preds

    def _jit_fused_eval_multi(self):
        """jit factory for the multi-batch eval (overridden under a mesh)."""
        return jax.jit(self._fused_eval_multi_impl)

    def fused_eval_multi_step(self, patches, mask, labels, weights, rngs):
        """K eval batches per device dispatch (leading (K,) axis)."""
        if not hasattr(self, "_fused_eval_multi"):
            self._fused_eval_multi = self._jit_fused_eval_multi()
        return self._fused_eval_multi(self.state.params,
                                      self.state.batch_stats, patches, mask,
                                      labels, weights, rngs)

    def _fused_sparse_eval_impl(self, params, batch_stats, flat_idx, values,
                                mask, labels, weights, rng, img_hw):
        """Densify + select + eval forward in ONE dispatch (the train-side
        fused_sparse_step's eval analog; VERDICT r2 weak #7)."""
        patches = self._densify_impl(flat_idx, values, img_hw)
        return self._fused_eval_impl(params, batch_stats, patches, mask,
                                     labels, weights, rng)

    def _jit_fused_sparse_eval(self):
        return jax.jit(self._fused_sparse_eval_impl, static_argnums=(8,))

    def fused_sparse_eval_step(self, flat_idx, values, img_hw, mask, labels,
                               weights, rng):
        if not hasattr(self, "_fused_sparse_eval"):
            self._fused_sparse_eval = self._jit_fused_sparse_eval()
        return self._fused_sparse_eval(
            self.state.params, self.state.batch_stats, jnp.asarray(flat_idx),
            jnp.asarray(values), mask, labels, weights, rng, tuple(img_hw))

    def _fused_sparse_eval_multi_impl(self, params, batch_stats, flat_idx,
                                      values, mask, labels, weights, rngs,
                                      img_hw):
        """K sparse eval batches per dispatch (scan; params are loop
        constants — eval carries no state)."""
        def body(carry, xs):
            out = self._fused_sparse_eval_impl(
                params, batch_stats, xs["i"], xs["v"], xs["m"], xs["lab"],
                xs["w"], xs["rng"], img_hw)
            return carry, out

        xs = {"i": flat_idx, "v": values, "m": mask, "lab": labels,
              "w": weights, "rng": rngs}
        _, (losses, task_losses, preds) = jax.lax.scan(
            body, jnp.zeros(()), xs)
        return losses, task_losses, preds

    def _jit_fused_sparse_eval_multi(self):
        return jax.jit(self._fused_sparse_eval_multi_impl,
                       static_argnums=(8,))

    def fused_sparse_eval_multi_step(self, flat_idx, values, img_hw, mask,
                                     labels, weights, rngs):
        """K sparse eval batches per device dispatch (leading (K,) axis)."""
        if not hasattr(self, "_fused_sparse_eval_multi"):
            self._fused_sparse_eval_multi = self._jit_fused_sparse_eval_multi()
        return self._fused_sparse_eval_multi(
            self.state.params, self.state.batch_stats, flat_idx, values,
            mask, labels, weights, rngs, tuple(img_hw))

    # -- fused select+train (B_seq == B fast path) --------------------------
    def _fused_impl(self, state: TrainState, patches, mask, labels, weights,
                    rng, lr):
        sel_rng, dropout_rng = jax.random.split(rng)
        mem_patch, mem_pos, _, mem_mask = self._select_impl(
            state.params, state.batch_stats, patches, mask, sel_rng)
        return self._train_impl(state, mem_patch, mem_pos, mem_mask, labels,
                                weights, dropout_rng, lr)

    def fused_step(self, patches, mask, labels, weights, rng, lr: float):
        self._require_opt()
        self.state, loss, task_losses, preds = self._fused(
            self.state, patches, mask, labels, weights, rng,
            jnp.asarray(lr, jnp.float32))
        return loss, task_losses, preds

    # -- multi-step: K fused steps in ONE dispatch --------------------------
    def _fused_multi_impl(self, state: TrainState, patches, mask, labels,
                          weights, rngs, lrs):
        """K fused select+train steps as a lax.scan over the leading step
        axis of stacked batches.

        The update sequence is IDENTICAL to K sequential `fused_step`
        calls with the same per-step (rng, lr) — the scan body IS
        `_fused_impl` — but per-dispatch overhead (measured ~5 ms/step on
        the remote-attached chip: RPC latency + per-call setup,
        `scripts/probe_fused_loop.py`) is paid once per K steps. The
        reference dispatches every phase separately
        (training/iterative.py:103-189).
        """
        def body(st, xs):
            st, loss, task_losses, preds = self._fused_impl(
                st, xs["p"], xs["m"], xs["lab"], xs["w"], xs["rng"],
                xs["lr"])
            return st, (loss, task_losses, preds)

        xs = {"p": patches, "m": mask, "lab": labels, "w": weights,
              "rng": rngs, "lr": lrs}
        state, (losses, task_losses, preds) = jax.lax.scan(body, state, xs)
        return state, losses, task_losses, preds

    def _jit_fused_multi(self):
        """jit factory for the multi-step path (overridden under a mesh)."""
        donate = (0,) if self.conf.donate_buffers else ()
        return jax.jit(self._fused_multi_impl, donate_argnums=donate)

    def fused_multi_step(self, patches, mask, labels, weights, rngs, lrs):
        """K fused steps per device dispatch (conf.steps_per_dispatch).

        patches/mask/labels/weights carry a leading (K,) step axis; rngs is
        (K, key), lrs (K,). Returns per-step (losses, task_losses, preds).
        """
        self._require_opt()
        if not hasattr(self, "_fused_multi"):
            self._fused_multi = self._jit_fused_multi()
        self.state, losses, task_losses, preds = self._fused_multi(
            self.state, patches, mask, labels, weights, rngs,
            jnp.asarray(lrs, jnp.float32))
        return losses, task_losses, preds

    def _fused_sparse_multi_impl(self, state: TrainState, flat_idx, values,
                                 mask, labels, weights, rngs, lrs, img_hw):
        """K fused sparse (densify+select+train) steps in one dispatch —
        the sparse-path analog of `_fused_multi_impl`."""
        def body(st, xs):
            st, loss, task_losses, preds = self._fused_sparse_impl(
                st, xs["i"], xs["v"], xs["m"], xs["lab"], xs["w"],
                xs["rng"], xs["lr"], img_hw)
            return st, (loss, task_losses, preds)

        xs = {"i": flat_idx, "v": values, "m": mask, "lab": labels,
              "w": weights, "rng": rngs, "lr": lrs}
        state, (losses, task_losses, preds) = jax.lax.scan(body, state, xs)
        return state, losses, task_losses, preds

    def _jit_fused_sparse_multi(self):
        donate = (0,) if self.conf.donate_buffers else ()
        return jax.jit(self._fused_sparse_multi_impl, donate_argnums=donate,
                       static_argnums=(8,))

    def fused_sparse_multi_step(self, flat_idx, values, img_hw, mask, labels,
                                weights, rngs, lrs):
        """K sparse fused steps per dispatch; leading (K,) step axis on
        every batch input, same per-step semantics as K
        `fused_sparse_step` calls."""
        self._require_opt()
        if not hasattr(self, "_fused_sparse_multi"):
            self._fused_sparse_multi = self._jit_fused_sparse_multi()
        self.state, losses, task_losses, preds = self._fused_sparse_multi(
            self.state, flat_idx, values, mask, labels, weights, rngs,
            jnp.asarray(lrs, jnp.float32), tuple(img_hw))
        return losses, task_losses, preds

    # -- assembled fused: r loader batches -> ONE optimizer step ------------
    def _fused_assembled_impl(self, state: TrainState, patches, mask,
                              labels, weights, sel_rngs, train_rng, lr):
        """B_seq < B fast path (the reference's default camelyon shape,
        reference config/camelyon_config.yml:4-5): selection over the r
        stacked loader batches + ONE gradient step, in one dispatch.

        Selection semantics are EXACTLY the K=1 assembler path's — each
        loader batch keeps its own rng (its own tie-break permutation) —
        the vmap only batches the r independent selections onto the MXU
        together instead of running r sequential dispatches (the reference
        runs them as r sequential host-looped forwards,
        training/iterative.py:118-152)."""
        # preencode resolution must see the TOTAL resident table
        # (r x B_seq x N), not the per-slice view inside the vmap
        pe = self._resolve_preencode(
            jax.ShapeDtypeStruct((patches.shape[0] * patches.shape[1],)
                                 + patches.shape[2:], patches.dtype))
        sel = jax.vmap(lambda p, m, k: self._select_impl(
            state.params, state.batch_stats, p, m, k,
            preencode=pe))(patches, mask, sel_rngs)
        mem_patch, mem_pos, _, mem_mask = sel

        def flat(x):
            return None if x is None else x.reshape((-1,) + x.shape[2:])

        return self._train_impl(state, flat(mem_patch), flat(mem_pos),
                                flat(mem_mask), labels, weights, train_rng,
                                lr)

    def _jit_fused_assembled(self):
        donate = (0,) if self.conf.donate_buffers else ()
        return jax.jit(self._fused_assembled_impl, donate_argnums=donate)

    def fused_assembled_step(self, patches, mask, labels, weights, sel_rngs,
                             train_rng, lr: float):
        """One optimizer step from r stacked loader batches:
        patches (r, B_seq, N, ...), mask (r, B_seq, N), labels/weights over
        the flattened B = r*B_seq rows, sel_rngs (r, key)."""
        self._require_opt()
        if not hasattr(self, "_fused_assembled"):
            self._fused_assembled = self._jit_fused_assembled()
        self.state, loss, task_losses, preds = self._fused_assembled(
            self.state, patches, mask, labels, weights, sel_rngs, train_rng,
            jnp.asarray(lr, jnp.float32))
        return loss, task_losses, preds

    def _fused_assembled_eval_impl(self, params, batch_stats, patches, mask,
                                   labels, weights, sel_rngs):
        """Eval analog of _fused_assembled_impl: r loader batches ->
        vmapped selections + ONE eval forward, one dispatch."""
        pe = self._resolve_preencode(
            jax.ShapeDtypeStruct((patches.shape[0] * patches.shape[1],)
                                 + patches.shape[2:], patches.dtype))
        reuse = self._reuse_eval_emb()
        sel = jax.vmap(lambda p, m, k: self._select_impl(
            params, batch_stats, p, m, k, preencode=pe,
            return_emb=reuse))(patches, mask, sel_rngs)

        def flat(x):
            return None if x is None else x.reshape((-1,) + x.shape[2:])

        if reuse:
            _, mem_pos, _, mem_mask, mem_emb = sel
            return self._eval_from_emb_impl(
                params, batch_stats, flat(mem_emb), flat(mem_pos),
                flat(mem_mask), labels, weights)
        mem_patch, mem_pos, _, mem_mask = sel
        return self._eval_impl(params, batch_stats, flat(mem_patch),
                               flat(mem_pos), flat(mem_mask), labels,
                               weights)

    def _jit_fused_assembled_eval(self):
        return jax.jit(self._fused_assembled_eval_impl)

    def fused_assembled_eval_step(self, patches, mask, labels, weights,
                                  sel_rngs):
        """One eval batch from r stacked loader batches (B_seq < B)."""
        if not hasattr(self, "_fused_assembled_eval"):
            self._fused_assembled_eval = self._jit_fused_assembled_eval()
        return self._fused_assembled_eval(
            self.state.params, self.state.batch_stats, patches, mask,
            labels, weights, sel_rngs)

    def _fused_assembled_eval_multi_impl(self, params, batch_stats, patches,
                                         mask, labels, weights, sel_rngs):
        """K assembled eval batches per dispatch (scan; params are loop
        constants)."""
        def body(carry, xs):
            out = self._fused_assembled_eval_impl(
                params, batch_stats, xs["p"], xs["m"], xs["lab"], xs["w"],
                xs["sk"])
            return carry, out

        xs = {"p": patches, "m": mask, "lab": labels, "w": weights,
              "sk": sel_rngs}
        _, (losses, task_losses, preds) = jax.lax.scan(
            body, jnp.zeros(()), xs)
        return losses, task_losses, preds

    def _jit_fused_assembled_eval_multi(self):
        return jax.jit(self._fused_assembled_eval_multi_impl)

    def fused_assembled_eval_multi_step(self, patches, mask, labels, weights,
                                        sel_rngs):
        """K assembled eval batches per device dispatch: patches
        (K, r, B_seq, N, ...), labels/weights (K, B, ...), sel_rngs
        (K, r, key)."""
        if not hasattr(self, "_fused_assembled_eval_multi"):
            self._fused_assembled_eval_multi = \
                self._jit_fused_assembled_eval_multi()
        return self._fused_assembled_eval_multi(
            self.state.params, self.state.batch_stats, patches, mask,
            labels, weights, sel_rngs)

    def _fused_assembled_multi_impl(self, state: TrainState, patches, mask,
                                    labels, weights, sel_rngs, train_rngs,
                                    lrs):
        """K assembled optimizer steps per dispatch (leading (K,) axis)."""
        def body(st, xs):
            st, loss, task_losses, preds = self._fused_assembled_impl(
                st, xs["p"], xs["m"], xs["lab"], xs["w"], xs["sk"],
                xs["tk"], xs["lr"])
            return st, (loss, task_losses, preds)

        xs = {"p": patches, "m": mask, "lab": labels, "w": weights,
              "sk": sel_rngs, "tk": train_rngs, "lr": lrs}
        state, (losses, task_losses, preds) = jax.lax.scan(body, state, xs)
        return state, losses, task_losses, preds

    def _jit_fused_assembled_multi(self):
        donate = (0,) if self.conf.donate_buffers else ()
        return jax.jit(self._fused_assembled_multi_impl,
                       donate_argnums=donate)

    def fused_assembled_multi_step(self, patches, mask, labels, weights,
                                   sel_rngs, train_rngs, lrs):
        """K assembled steps per device dispatch: patches
        (K, r, B_seq, N, ...), labels/weights (K, B, ...), sel_rngs
        (K, r, key), train_rngs (K, key), lrs (K,)."""
        self._require_opt()
        if not hasattr(self, "_fused_assembled_multi"):
            self._fused_assembled_multi = self._jit_fused_assembled_multi()
        self.state, losses, task_losses, preds = self._fused_assembled_multi(
            self.state, patches, mask, labels, weights, sel_rngs, train_rngs,
            jnp.asarray(lrs, jnp.float32))
        return losses, task_losses, preds

    # -- fused sparse select+train: ONE dispatch from (idx, val) pairs ------
    def _jit_fused_sparse(self):
        """jit factory for the fused sparse step (overridden under a mesh).

        img_hw is a positional static arg (index 8): pjit rejects kwargs
        when in_shardings are given (the sharded override needs them).
        """
        donate = (0,) if self.conf.donate_buffers else ()
        return jax.jit(self._fused_sparse_impl, donate_argnums=donate,
                       static_argnums=(8,))

    def _fused_sparse_impl(self, state, flat_idx, values, mask, labels,
                           weights, rng, lr, img_hw):
        patches = self._densify_impl(flat_idx, values, img_hw)
        return self._fused_impl(state, patches, mask, labels, weights, rng,
                                lr)

    def fused_sparse_step(self, flat_idx, values, img_hw, mask, labels,
                          weights, rng, lr: float):
        """Densify + select + train in one jit (sparse_input fast path);
        a single device dispatch per optimizer step — on remote-attached
        TPUs the per-call RPC latency dominates small-step training."""
        self._require_opt()
        if not hasattr(self, "_fused_sparse"):
            self._fused_sparse = self._jit_fused_sparse()
        self.state, loss, task_losses, preds = self._fused_sparse(
            self.state, jnp.asarray(flat_idx), jnp.asarray(values), mask,
            labels, weights, rng, jnp.asarray(lr, jnp.float32),
            tuple(img_hw))
        return loss, task_losses, preds
