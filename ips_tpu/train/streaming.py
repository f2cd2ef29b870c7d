"""Streaming (lazy) selection: patches stay in host RAM, chunks stream in.

The reference's lazy mode keeps the (B, N, ...) patch tensor on the host
and moves one I-chunk to the device per selection iteration
(reference main.py:121 `conf.eager`, ips_net.py:206,223). TPU-native
equivalent: one jitted selection step compiled once, a host loop that
gathers chunk k+1 and starts its `jax.device_put` while the device is
busy with chunk k (double buffering), and a final host-side gather of the
M surviving raw patches. Device memory holds O(M + I) patches — images of
any N fit, bounded only by host RAM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ips_tpu.ops.selection import ips_select_streaming_step
from ips_tpu.ops.shuffle import make_permutation


class StreamingSelector:
    """Owns the per-chunk jitted step for an IPSTrainer."""

    def __init__(self, trainer):
        self.trainer = trainer
        self.conf = trainer.conf

        def init_fn(params, batch_stats, init_patch):
            encode, _ = trainer._enc_score_fns(params, batch_stats)
            return encode(init_patch)

        def step_fn(params, batch_stats, mem_emb, mem_idx, mem_valid,
                    chunk, chunk_idx, chunk_valid):
            encode, score = trainer._enc_score_fns(params, batch_stats)
            return ips_select_streaming_step(
                encode, score, mem_emb, mem_idx, mem_valid, chunk,
                chunk_idx, chunk_valid, self.conf.M,
                pos_table=trainer._pos_table_const())

        self._init = jax.jit(init_fn)
        self._step = jax.jit(step_fn)

        # Chunk grouping (conf.stream_chunk_group = G): the host stacks G
        # consecutive chunks into one (G, B, I, ...) stage and the device
        # scans the selection step over them — one dispatch + one
        # device_put per G chunks. Exact: params are constant within a
        # selection, and the scan body IS step_fn, applied in the same
        # chunk order. Leftover chunks (len(starts) % G) run the
        # per-chunk engine above, so no padded chunks are ever encoded.
        self._group = max(int(self.conf.stream_chunk_group), 1)

        def group_fn(params, batch_stats, mem_emb, mem_idx, mem_valid,
                     chunks, chunk_idx, chunk_valid):
            encode, score = trainer._enc_score_fns(params, batch_stats)
            pos = trainer._pos_table_const()

            def body(carry, xs):
                me, mi, mv = carry
                c, ci, cv = xs
                return ips_select_streaming_step(
                    encode, score, me, mi, mv, c, ci, cv, self.conf.M,
                    pos_table=pos), None

            carry, _ = jax.lax.scan(
                body, (mem_emb, mem_idx, mem_valid),
                (chunks, chunk_idx, chunk_valid))
            return carry

        self._gstep = jax.jit(group_fn) if self._group > 1 else None

    def _put(self, x):
        """device_put honoring the trainer's mesh: batch dim over `data`,
        and (under context parallelism) the chunk's patch dim over
        `patch`, so each device encodes its slice of every streamed chunk
        — XLA all-gathers only the (B, I, D) chunk embeddings for the
        scoring/top-M, never raw patches. Selection numerics identical."""
        s = self.trainer._stream_sharding(x)
        return jax.device_put(x, s) if s is not None else jax.device_put(x)

    def _put_group(self, x):
        """device_put for a stacked (G, B, I, ...) chunk group: the scan
        axis is replicated; the inner (B, I, ...) dims shard exactly as a
        single streamed chunk would (`_stream_sharding` semantics)."""
        s = self.trainer._stream_group_sharding(x)
        return jax.device_put(x, s) if s is not None else jax.device_put(x)

    def _put_out(self, x):
        """Placement for the selection OUTPUTS (the (B, M, ...) memory
        batch): data axis only — the train/eval jits' in_shardings expect
        it, and jax >= 0.9 rejects committed args whose sharding
        disagrees."""
        if x is None:
            return None
        s = self.trainer._stream_out_sharding(x)
        return jax.device_put(x, s) if s is not None else jax.device_put(x)

    def _host_cast(self, x: np.ndarray) -> np.ndarray:
        """Honor input_dtype=bfloat16 on the host side: halves the
        host->HBM volume of every streamed chunk (the bottleneck lazy mode
        exists for) with numerics identical to the eager path — the
        encoder casts inputs to bf16 at its first conv either way."""
        if self.conf.input_dtype == "bfloat16" and x.dtype != np.uint8:
            return x.astype(jnp.bfloat16)
        return x

    def select(self, patches: np.ndarray, mask: Optional[np.ndarray] = None,
               rng: Optional[jax.Array] = None, return_emb: bool = False
               ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array,
                          jax.Array]:
        """Returns (mem_patch, mem_pos, mem_idx, mem_mask) on device;
        with return_emb=True appends the buffer's raw (B, M, D) embeddings
        (already on device — the scan carry), letting eval skip both the
        host-side patch gather and the re-encode. None on the M >= N
        shortcut, which never encodes."""
        conf = self.conf
        trainer = self.trainer
        M, I = conf.M, conf.I
        B, N = patches.shape[:2]
        state = trainer.state

        if mask is None:
            mask_np = np.ones((B, N), bool)
        else:
            mask_np = np.asarray(mask)

        # Shortcut parity with the scan engine (reference ips_net.py:184-188).
        if M >= N:
            idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
            pos = (self._put_out(np.broadcast_to(
                       trainer.pos_table[None, :N], (B, N, conf.D)))
                   if trainer.pos_table is not None else None)
            if return_emb:
                # the shortcut never encoded anything: encode all N once —
                # exactly the dispatch the eval re-encode would have paid
                emb = self._init(state.params, state.batch_stats,
                                 self._put(self._host_cast(
                                     np.asarray(patches))))
                return (None, pos, idx, self._put_out(mask_np),
                        self._put_out(emb))
            dev_patch = self._put_out(self._host_cast(np.asarray(patches)))
            return dev_patch, pos, idx, self._put_out(mask_np)

        # Same permutation semantics as the fused engine (tiny, device ok).
        perm = np.asarray(make_permutation(
            rng, B, N, jnp.asarray(mask_np), conf.shuffle,
            conf.shuffle_style))
        perm_valid = np.take_along_axis(mask_np, perm, axis=1)

        rows = np.arange(B)[:, None]
        from ips_tpu.native import gather_patches

        def host_chunk(start: int, size: int):
            idx = perm[:, start:start + size]
            valid = perm_valid[:, start:start + size]
            if idx.shape[1] < size:                 # ragged tail: pad
                pad = size - idx.shape[1]
                idx = np.pad(idx, ((0, 0), (0, pad)))
                valid = np.pad(valid, ((0, 0), (0, pad)))
            return (self._host_cast(gather_patches(patches, idx)),
                    idx.astype(np.int32), valid)

        # init buffer = first M (post-shuffle) patches
        init_np, init_idx, init_valid = host_chunk(0, M)
        mem_emb = self._init(state.params, state.batch_stats,
                             self._put(init_np))
        mem_idx = self._put(init_idx)
        mem_valid = self._put(init_valid)

        starts = list(range(M, N, I))

        # Chunk grouping: full G-sized runs of chunks go through one
        # scanned dispatch each; the remainder falls through to the
        # per-chunk engine below (same chunk order, so results are
        # identical to G=1 — regression-tested in tests/test_streaming.py).
        G = self._group
        if G > 1:
            n_full = (len(starts) // G) * G
            group_starts = [starts[i:i + G] for i in range(0, n_full, G)]
            rest = starts[n_full:]
        else:
            group_starts, rest = [], starts

        def host_group(gs):
            cs = [host_chunk(s, I) for s in gs]
            return (np.stack([c[0] for c in cs]),
                    np.stack([c[1] for c in cs]),
                    np.stack([c[2] for c in cs]))

        # double buffer: next group's transfer starts before we block
        next_dev = None
        if group_starts:
            next_dev = tuple(self._put_group(x)
                             for x in host_group(group_starts[0]))
        for k in range(len(group_starts)):
            cur = next_dev
            if k + 1 < len(group_starts):
                next_dev = tuple(self._put_group(x)
                                 for x in host_group(group_starts[k + 1]))
            mem_emb, mem_idx, mem_valid = self._gstep(
                state.params, state.batch_stats, mem_emb, mem_idx,
                mem_valid, *cur)

        # per-chunk engine: the whole schedule when G == 1, the ragged
        # tail (< G chunks) otherwise — no padded chunks are ever encoded
        next_dev = None
        if rest:
            c, ci, cv = host_chunk(rest[0], I)
            next_dev = (self._put(c), self._put(ci), self._put(cv))
        for k, start in enumerate(rest):
            cur = next_dev
            if k + 1 < len(rest):
                c, ci, cv = host_chunk(rest[k + 1], I)
                next_dev = (self._put(c), self._put(ci), self._put(cv))
            mem_emb, mem_idx, mem_valid = self._step(
                state.params, state.batch_stats, mem_emb, mem_idx,
                mem_valid, *cur)

        mem_idx_np = np.asarray(mem_idx)
        if return_emb:
            # eval reuse: the buffer embeddings ARE the carry — no host
            # patch gather, no (B, M, patch) re-upload, no re-encode
            mem_pos = (self._put_out(trainer.pos_table[mem_idx_np])
                       if trainer.pos_table is not None else None)
            return (None, mem_pos, self._put_out(mem_idx),
                    self._put_out(mem_valid), self._put_out(mem_emb))
        mem_patch = self._put_out(self._host_cast(patches[rows, mem_idx_np]))
        # gather on the host: ships (B, M, D) instead of the full (N, D) table
        mem_pos = (self._put_out(trainer.pos_table[mem_idx_np])
                   if trainer.pos_table is not None else None)
        # re-place the jit-inferred carries too: their output shardings are
        # XLA's choice and may span the patch axis
        return mem_patch, mem_pos, self._put_out(mem_idx), \
            self._put_out(mem_valid)
