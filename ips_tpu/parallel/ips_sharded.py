"""Sharded IPS: data parallelism + context parallelism over the patch axis.

Both are NEW capabilities over the single-GPU reference (SURVEY.md §2.3).

Data parallelism: the trainer's jitted steps are compiled with
`NamedSharding` constraints — the global batch is sharded over the `data`
mesh axis, parameters/optimizer state are replicated, and XLA inserts the
gradient psums over ICI.

Context parallelism, two modes (conf.cp_select):

* ``'exact'`` (default): the single global selection stream of
  `ips_select` runs unchanged; only each chunk's ENCODE is sharded over
  the `patch` mesh axis, and the (B, n, D) embeddings are re-replicated
  for scoring (`ShardedIPSTrainer._selection_encode_wrap`) — one
  embedding all-gather per chunk over ICI, numerics IDENTICAL to
  single-device on every eager path (the streaming path already used
  this construction; tests/test_cp_exact.py asserts equality).

* ``'local_merge'`` (opt-in, ``ips_select_cp``): the N-patch axis is
  split into ``n_shards`` contiguous slices; each slice runs the
  standard streaming top-M selection *locally* (zero cross-device
  traffic during the scan), then the n_shards x M local survivors are
  merged with ONE global rescoring + top-M. Embeddings travel
  (M x D floats per shard), never raw patches. IPS scoring is
  softmax-normalized over each candidate set, so this variant is a
  heuristic of the same family as the reference's stream — it agrees
  exactly whenever scores are set-independent (tests/test_parallel.py)
  and at Jaccard 0.97-0.99 otherwise (tests/test_cp_fidelity.py). Keep
  for bandwidth-starved meshes where the per-chunk all-gather hurts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ips_tpu.config import Config
from ips_tpu.ops.selection import (SelectionResult, _gather_patches,
                                   ips_select, select_top_m)
from ips_tpu.parallel.mesh import DATA_AXIS, PATCH_AXIS, make_mesh
from ips_tpu.train.steps import IPSTrainer


def ips_select_cp(encode_fn, score_fn, patches, *, M: int, I: int,
                  n_shards: int, pos_table=None, mask=None, rng=None,
                  shuffle: bool = False, shuffle_style: str = "batch",
                  return_emb: bool = False) -> SelectionResult:
    """Context-parallel IPS: per-shard local top-M, then one global merge.

    patches: (B, N, ...) with N divisible by n_shards. Under a mesh, shard
    the N axis over `patch`; the vmapped local scans then run one shard
    per device group with no communication until the merge.
    """
    B, N = patches.shape[:2]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by n_shards={n_shards}")
    n_local = N // n_shards
    if M >= n_local:
        raise ValueError(
            f"context parallelism needs M < N/n_shards (M={M}, "
            f"N/n_shards={n_local}); reduce n_shards or use single-shard "
            "selection")

    shard_shape = (B, n_shards, n_local) + patches.shape[2:]
    patches_s = patches.reshape(shard_shape)
    mask_s = (mask.reshape(B, n_shards, n_local)
              if mask is not None
              else jnp.ones((B, n_shards, n_local), bool))
    pos_s = (pos_table.reshape(n_shards, n_local, pos_table.shape[-1])
             if pos_table is not None else None)
    rngs = (jax.random.split(rng, n_shards) if rng is not None
            else jnp.zeros((n_shards, 2), jnp.uint32))

    def local(p, m, pos, key):
        res = ips_select(encode_fn, score_fn, p, M=M, I=I, pos_table=pos,
                         mask=m, rng=key if shuffle else None,
                         shuffle=shuffle, shuffle_style=shuffle_style,
                         return_emb=True)
        return res.mem_emb, res.mem_idx, res.mem_mask

    local_emb, local_idx, local_valid = jax.vmap(
        local, in_axes=(1, 1, 0 if pos_s is not None else None, 0),
        out_axes=1)(patches_s, mask_s, pos_s, rngs)
    # local_*: (B, n_shards, M, ...); convert shard-local to global indices.
    offsets = (jnp.arange(n_shards, dtype=jnp.int32) * n_local)[None, :, None]
    g_idx = (local_idx + offsets).reshape(B, n_shards * M)
    g_emb = local_emb.reshape(B, n_shards * M, -1)
    g_valid = local_valid.reshape(B, n_shards * M)

    # Global merge: one rescoring over the union of survivors.
    emb_to_score = g_emb + pos_table[g_idx] if pos_table is not None else g_emb
    mem_emb, mem_idx, mem_valid = select_top_m(g_emb, emb_to_score, g_idx,
                                               g_valid, M, score_fn)

    mem_patch = jax.lax.stop_gradient(_gather_patches(patches, mem_idx))
    mem_pos = (jax.lax.stop_gradient(pos_table[mem_idx])
               if pos_table is not None else None)
    return SelectionResult(mem_patch, mem_pos, mem_idx, mem_valid,
                           mem_emb if return_emb else None)


class ShardedIPSTrainer(IPSTrainer):
    """IPSTrainer compiled against a (data, patch) device mesh."""

    def __init__(self, conf: Config, mesh=None,
                 rng: Optional[jax.Array] = None):
        self.mesh = mesh if mesh is not None else make_mesh(
            conf.mesh_data, conf.mesh_patch)
        self.n_cp = self.mesh.shape[PATCH_AXIS]
        n_dp = self.mesh.shape[DATA_AXIS]
        if conf.B % n_dp:
            raise ValueError(
                f"B={conf.B} must be a multiple of the data mesh axis "
                f"({n_dp})")
        # B_seq need NOT divide the data axis: selection over a
        # (B_seq, N, ...) loader batch then shards the patch axis only
        # (row-replicated), and the assembled fused path shards the
        # r = B/B_seq loader-slot axis instead (_assembled_spec) — this is
        # how the reference's default camelyon shape (B_seq=1,
        # camelyon_config.yml:4-5) runs on a mesh at all.
        self._seq_dat = DATA_AXIS if conf.B_seq % n_dp == 0 else None
        if self.n_cp > 1:
            if conf.N % self.n_cp:
                raise ValueError(
                    f"N={conf.N} must be divisible by the patch mesh axis "
                    f"({self.n_cp})")
            # exact CP has no M constraint — it runs the single global
            # stream; only the local-merge approximation needs every shard
            # to hold M local survivors
            if (conf.cp_select == "local_merge"
                    and conf.M >= conf.N // self.n_cp):
                raise ValueError(
                    f"cp_select='local_merge' needs M < N/mesh_patch "
                    f"(M={conf.M}, N/mesh_patch={conf.N // self.n_cp})")
        super().__init__(conf, rng)

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P(DATA_AXIS))
        datp = NamedSharding(self.mesh, P(DATA_AXIS, PATCH_AXIS))
        self._shardings = (rep, dat, datp)

        # Multi-host (one process per host, mesh spanning all hosts): jitted
        # steps return fully-replicated outputs so every process can read
        # losses/preds for metric logging without extra collectives on the
        # host side. Single-process meshes keep XLA's output shardings.
        self._multihost = jax.process_count() > 1
        self._out_kw = {"out_shardings": rep} if self._multihost else {}

        # Replicate model/optimizer state across the mesh.
        if self._multihost:
            from ips_tpu.parallel.distributed import put_replicated_global
            self.state = put_replicated_global(self.mesh, self.state)
        else:
            self.state = jax.device_put(self.state, rep)

        donate = (0,) if conf.donate_buffers else ()
        seqdatp = NamedSharding(self.mesh, P(self._seq_dat, PATCH_AXIS))
        self._select = jax.jit(
            self._select_impl,
            in_shardings=(rep, rep, seqdatp, seqdatp, rep), **self._out_kw)
        self._train = jax.jit(
            self._train_impl, donate_argnums=donate,
            in_shardings=(rep, dat, dat, dat, dat, dat, rep, rep),
            **self._out_kw)
        self._eval = jax.jit(
            self._eval_impl,
            in_shardings=(rep, rep, dat, dat, dat, dat, dat), **self._out_kw)
        self._fused = jax.jit(
            self._fused_impl, donate_argnums=donate,
            in_shardings=(rep, datp, datp, dat, dat, rep, rep),
            **self._out_kw)

    # -- device placement (loop.py hook) ------------------------------------
    def put_batch(self, tree, patch_dim=None):
        """Shard a loader-batch pytree: dim 0 over `data`, patch_dim over
        `patch` — transfers land directly in the jitted steps' layout.

        Multi-host: each process passes its LOCAL rows (from the
        process-sharded DataLoader); the result is the global batch with
        each host's rows staying on its own devices."""
        if self._multihost:
            from ips_tpu.parallel.distributed import shard_batch_global
            return shard_batch_global(self.mesh, tree, patch_dim)
        from ips_tpu.parallel.mesh import shard_batch
        return shard_batch(self.mesh, tree, patch_dim)

    def put_assembled(self, tree):
        """Place a stacked assembled payload (r, B_seq, N, ...): the r
        loader-slot axis shards over `data`, the N patch axis over `patch`.

        Multi-host: each process passes its LOCAL (r/P, B_seq, N, ...)
        slot stack (its contiguous chunk of the global optimizer batch,
        loaded by the process-sharded DataLoader at optimizer-batch
        granularity); the global r-slot array keeps each host's slots on
        its own devices."""
        if self._multihost:
            from ips_tpu.parallel.distributed import shard_batch_global
            return shard_batch_global(self.mesh, tree, patch_dim=2)
        from jax.sharding import NamedSharding

        from ips_tpu.parallel.mesh import batch_spec

        def put(x):
            if x is None:
                return None
            import numpy as np
            spec = batch_spec(np.ndim(x), 2 if np.ndim(x) > 2 else None)
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree.map(put, tree)

    def put_replicated(self, tree):
        """Replicate small per-step values (rng keys) over the mesh; every
        process passes identical values (seeded from the step index)."""
        if self._multihost:
            from ips_tpu.parallel.distributed import put_replicated_global
            return put_replicated_global(self.mesh, tree)
        return jax.device_put(tree, self._shardings[0])

    def _stream_spec(self, shape):
        """PartitionSpec for a streamed (B, I, ...) chunk of this shape:
        batch dim over `data`; under context parallelism (mesh_patch > 1)
        a divisible dim 1 — the chunk's patch axis — additionally shards
        over `patch`, so every device encodes I/n_cp patches of each
        streamed chunk and XLA all-gathers only the (B, I, D) embeddings
        for scoring (SURVEY §5 long-context: the patch-axis upgrade now
        reaches the lazy path too)."""
        from ips_tpu.parallel.mesh import batch_spec
        ndim = len(shape)
        patch_dim = None
        if self.n_cp > 1 and ndim >= 2 and shape[1] % self.n_cp == 0:
            patch_dim = 1
        spec = batch_spec(ndim, patch_dim)
        if shape[0] % self.mesh.shape[DATA_AXIS]:
            # B_seq rows don't divide the data axis (e.g. the reference's
            # B_seq=1 camelyon shape): replicate rows, shard patches only
            spec = P(None, *spec[1:])
        return spec

    def _stream_sharding(self, x):
        """Streamed chunk tensors — see `_stream_spec`."""
        import numpy as np
        return NamedSharding(self.mesh, self._stream_spec(np.shape(x)))

    def _stream_group_sharding(self, x):
        """Stacked (G, B, I, ...) chunk groups: the leading scan axis is
        replicated (every device scans all G chunks); the inner dims
        shard exactly like a single streamed chunk."""
        import numpy as np
        inner = self._stream_spec(np.shape(x)[1:])
        return NamedSharding(self.mesh, P(None, *inner))

    def _stream_out_sharding(self, x):
        """Streamed-selection outputs feed the train/eval jits, whose
        in_shardings put the memory batch on the data axis only."""
        import numpy as np

        from ips_tpu.parallel.mesh import batch_spec
        return NamedSharding(self.mesh, batch_spec(np.ndim(x)))

    # -- sharded jit factories for the lazily-built fused paths -------------
    def _jit_eval_from_emb(self):
        rep, dat, datp = self._shardings
        return jax.jit(self._eval_from_emb_impl,
                       in_shardings=(rep, rep, dat, dat, dat, dat, dat),
                       **self._out_kw)

    def _jit_fused_eval(self):
        rep, dat, datp = self._shardings
        return jax.jit(self._fused_eval_impl,
                       in_shardings=(rep, rep, datp, datp, dat, dat, rep),
                       **self._out_kw)

    def _jit_fused_multi(self):
        rep, dat, datp = self._shardings
        donate = (0,) if self.conf.donate_buffers else ()
        # leading (K,) step axis is unsharded; batch dims shift by one
        kdatp = NamedSharding(self.mesh, P(None, DATA_AXIS, PATCH_AXIS))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_multi_impl, donate_argnums=donate,
                       in_shardings=(rep, kdatp, kdatp, kdat, kdat, rep,
                                     rep), **self._out_kw)

    def _jit_fused_eval_multi(self):
        rep, dat, datp = self._shardings
        kdatp = NamedSharding(self.mesh, P(None, DATA_AXIS, PATCH_AXIS))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_eval_multi_impl,
                       in_shardings=(rep, rep, kdatp, kdatp, kdat, kdat,
                                     rep), **self._out_kw)

    def _jit_fused_sparse(self):
        rep, dat, datp = self._shardings
        donate = (0,) if self.conf.donate_buffers else ()
        # flat_idx/values are (B, nnz): data-sharded; the densified patch
        # tensor inherits the (data, patch) layout inside the jit.
        return jax.jit(self._fused_sparse_impl, donate_argnums=donate,
                       static_argnames=("img_hw",),
                       in_shardings=(rep, dat, dat, datp, dat, dat, rep,
                                     rep), **self._out_kw)

    def _jit_fused_sparse_multi(self):
        rep, dat, datp = self._shardings
        donate = (0,) if self.conf.donate_buffers else ()
        kdatp = NamedSharding(self.mesh, P(None, DATA_AXIS, PATCH_AXIS))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_sparse_multi_impl, donate_argnums=donate,
                       static_argnums=(8,),
                       in_shardings=(rep, kdat, kdat, kdatp, kdat, kdat,
                                     rep, rep), **self._out_kw)

    def _assembled_spec(self) -> P:
        """Sharding of the stacked (r, B_seq, N, ...) assembled payload.

        Two valid data-parallel layouts exist; pick by divisibility:

        * shard the r loader-slot axis (dim 0) — REQUIRED under multi-host
          (each process's r/P slots stay on its own devices; see
          loop._train_epoch_assembled_mh) and the only option when
          B_seq < n_data (the reference's default camelyon shape is
          B_seq=1, reference config/camelyon_config.yml:4-5);
        * shard the B_seq row axis (dim 1) — the single-process layout
          when B_seq divides n_data (kept for continuity with the
          measured round-3 behavior).

        Either way the flattened (B, M, D) train batch lands r-major, so
        the `dat`-sharded labels line up with slot-axis sharding exactly
        and cost one small reshard under row-axis sharding.
        """
        nd = self.mesh.shape[DATA_AXIS]
        r = self.conf.B // max(self.conf.B_seq, 1)
        if not self._multihost and self.conf.B_seq % nd == 0:
            return P(None, DATA_AXIS, PATCH_AXIS)
        if r % nd == 0:
            return P(DATA_AXIS, None, PATCH_AXIS)
        if self._multihost:
            raise ValueError(
                f"multi-host assembled path needs r = B/B_seq divisible by "
                f"the data-axis size (r={r}, data={nd})")
        return P(None, None, PATCH_AXIS)

    def _jit_fused_assembled(self):
        rep, dat, datp = self._shardings
        donate = (0,) if self.conf.donate_buffers else ()
        rdatp = NamedSharding(self.mesh, self._assembled_spec())
        return jax.jit(self._fused_assembled_impl, donate_argnums=donate,
                       in_shardings=(rep, rdatp, rdatp, dat, dat, rep, rep,
                                     rep), **self._out_kw)

    def _jit_fused_assembled_multi(self):
        rep, dat, datp = self._shardings
        donate = (0,) if self.conf.donate_buffers else ()
        krdatp = NamedSharding(self.mesh, P(None, *self._assembled_spec()))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_assembled_multi_impl,
                       donate_argnums=donate,
                       in_shardings=(rep, krdatp, krdatp, kdat, kdat, rep,
                                     rep, rep), **self._out_kw)

    def _jit_fused_assembled_eval(self):
        rep, dat, datp = self._shardings
        rdatp = NamedSharding(self.mesh, self._assembled_spec())
        return jax.jit(self._fused_assembled_eval_impl,
                       in_shardings=(rep, rep, rdatp, rdatp, dat, dat, rep),
                       **self._out_kw)

    def _jit_fused_assembled_eval_multi(self):
        rep, dat, datp = self._shardings
        krdatp = NamedSharding(self.mesh, P(None, *self._assembled_spec()))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_assembled_eval_multi_impl,
                       in_shardings=(rep, rep, krdatp, krdatp, kdat, kdat,
                                     rep), **self._out_kw)

    def _jit_fused_sparse_eval(self):
        rep, dat, datp = self._shardings
        return jax.jit(self._fused_sparse_eval_impl, static_argnums=(8,),
                       in_shardings=(rep, rep, dat, dat, datp, dat, dat,
                                     rep), **self._out_kw)

    def _jit_fused_sparse_eval_multi(self):
        rep, dat, datp = self._shardings
        kdatp = NamedSharding(self.mesh, P(None, DATA_AXIS, PATCH_AXIS))
        kdat = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(self._fused_sparse_eval_multi_impl,
                       static_argnums=(8,),
                       in_shardings=(rep, rep, kdat, kdat, kdatp, kdat,
                                     kdat, rep), **self._out_kw)

    def _place_assembled(self, patches, mask, labels, weights, lead=0):
        """Re-place eagerly-stacked assembled payloads onto the jits'
        expected shardings: jnp.stack/concatenate of per-batch sharded
        arrays carries a GSPMD-inferred sharding that explicit
        in_shardings reject (instead of resharding) whenever the per-batch
        layout differs — e.g. B_seq < n_data batches are row-replicated,
        while the assembled jit shards the loader-slot axis
        (_assembled_spec). `lead` counts extra leading axes (1 for the
        K-stacked multi-step payloads)."""
        lead_n = [None] * lead
        s_pm = NamedSharding(self.mesh, P(*lead_n, *self._assembled_spec()))
        s_dat = NamedSharding(self.mesh, P(*lead_n, DATA_AXIS))
        return (jax.device_put(patches, s_pm), jax.device_put(mask, s_pm),
                {k: jax.device_put(v, s_dat) for k, v in labels.items()},
                jax.device_put(weights, s_dat))

    def fused_assembled_step(self, patches, mask, labels, weights, sel_rngs,
                             train_rng, lr):
        patches, mask, labels, weights = self._place_assembled(
            patches, mask, labels, weights)
        return super().fused_assembled_step(patches, mask, labels, weights,
                                            sel_rngs, train_rng, lr)

    def fused_assembled_multi_step(self, patches, mask, labels, weights,
                                   sel_rngs, train_rngs, lrs):
        patches, mask, labels, weights = self._place_assembled(
            patches, mask, labels, weights, lead=1)
        return super().fused_assembled_multi_step(
            patches, mask, labels, weights, sel_rngs, train_rngs, lrs)

    def fused_assembled_eval_step(self, patches, mask, labels, weights,
                                  sel_rngs):
        patches, mask, labels, weights = self._place_assembled(
            patches, mask, labels, weights)
        return super().fused_assembled_eval_step(patches, mask, labels,
                                                 weights, sel_rngs)

    def fused_assembled_eval_multi_step(self, patches, mask, labels,
                                        weights, sel_rngs):
        patches, mask, labels, weights = self._place_assembled(
            patches, mask, labels, weights, lead=1)
        return super().fused_assembled_eval_multi_step(
            patches, mask, labels, weights, sel_rngs)

    def _selection_encode_wrap(self):
        """Exact context parallelism for every eager selection path.

        Encoding is per-patch, so placement cannot change numerics: shard
        each selection encode's patch axis (dim 1) over the mesh `patch`
        axis — every device encodes n/n_cp patches of each chunk — then
        re-replicate the (B, n, D) embeddings so scoring + top-M run the
        IDENTICAL single global stream as one device (the construction the
        streaming path already uses via _stream_sharding; VERDICT round-4
        item 4 ports it into the `ips_select` scan body). XLA compiles the
        replication into one (B, n, D) all-gather per chunk over ICI —
        embeddings travel, never raw patches."""
        if self.n_cp <= 1 or self.conf.cp_select != "exact":
            return None
        mesh, n_cp = self.mesh, self.n_cp
        n_dp = mesh.shape[DATA_AXIS]

        def wrap(encode_fn, x):
            dp = DATA_AXIS if x.shape[0] % n_dp == 0 else None
            if x.shape[1] % n_cp == 0:
                spec = P(dp, PATCH_AXIS, *([None] * (x.ndim - 2)))
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))
            emb = jax.lax.with_sharding_constraint(
                encode_fn(x), NamedSharding(mesh, P(dp, None, None)))
            return emb

        return wrap

    def _select_impl(self, params, batch_stats, patches, mask, rng,
                     preencode=None, return_emb=False):
        conf = self.conf
        if self.n_cp <= 1 or conf.cp_select == "exact":
            # exact CP rides the base path: _selection_encode_wrap shards
            # the chunk encodes; everything else is numerics-identical to
            # single-device
            return super()._select_impl(params, batch_stats, patches, mask,
                                        rng, preencode=preencode,
                                        return_emb=return_emb)
        # cp_select='local_merge': the legacy approximate merge (per-shard
        # local top-M, zero comms during the scan, one global rescoring).
        # `preencode` does not pass through — this path streams per-shard
        # chunks and never pre-encodes ('auto' resolves off here).
        import jax.numpy as jnp
        if conf.input_dtype == "bfloat16" and patches.dtype != jnp.uint8:
            patches = patches.astype(jnp.bfloat16)
        encode, score = self._enc_score_fns(params, batch_stats)
        res = ips_select_cp(
            encode, score, patches, M=conf.M, I=conf.I, n_shards=self.n_cp,
            pos_table=self._pos_table_const(), mask=mask, rng=rng,
            shuffle=conf.shuffle, shuffle_style=conf.shuffle_style,
            return_emb=return_emb)
        if return_emb:
            return (res.mem_patch, res.mem_pos, res.mem_idx, res.mem_mask,
                    res.mem_emb)
        return res.mem_patch, res.mem_pos, res.mem_idx, res.mem_mask
