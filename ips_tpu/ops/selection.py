"""The IPS selection engine: a `lax.scan` with a running top-M buffer.

This is the TPU-native re-design of the reference's Python selection loop
(reference architecture/ips_net.py:169-262):

  reference (torch)                        here (JAX/XLA)
  ---------------------------------------  ---------------------------------
  data-dependent `for i in range(n_iter)`  `lax.scan` over a static chunk count
  ragged tail chunk (ips_net.py:220-221)   index padding + validity masking
  `torch.topk` + `gather`                  `lax.top_k` + `take_along_axis`
  physical shuffle of the patch tensor     index permutation, zero HBM traffic
  `.eval()` mode flips (ips_net.py:190-193) deterministic closures by construction
  `@torch.no_grad()`                       runs outside the differentiated fn
                                           (+ explicit stop_gradient)

Semantics preserved exactly (each is tested):
  * shortcut when M >= N returns all patches (ips_net.py:184-188)
  * buffer initialized with the first M (post-shuffle) patches
    (ips_net.py:203-214)
  * scoring uses embeddings + positional encoding, but the buffer keeps the
    *raw* embeddings, and the final output gathers raw *patches* which are
    re-encoded with gradients later (ips_net.py:142,151-153,243-247)
  * ties broken by candidate order, randomized by the shuffle

Memory is O(M + I): the scan carry holds (B, M) embeddings and indices; the
full patch tensor stays in HBM and only I-patch chunks are ever encoded.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ips_tpu.ops.shuffle import make_permutation

from ips_tpu.constants import NEG_INF

EncodeFn = Callable[[jax.Array], jax.Array]          # (B, n, ...) -> (B, n, D)
ScoreFn = Callable[[jax.Array, Optional[jax.Array]], jax.Array]
#                   (B, L, D), (B, L) mask -> (B, L)


@dataclasses.dataclass
class SelectionResult:
    mem_patch: jax.Array                 # (B, M, ...) selected raw patches
    mem_pos: Optional[jax.Array]         # (B, M, D) positional encodings
    mem_idx: jax.Array                   # (B, M) original patch indices
    mem_mask: jax.Array                  # (B, M) bool validity
    mem_emb: Optional[jax.Array] = None  # (B, M, D) raw embeddings
                                         # (kept only when return_emb=True,
                                         #  used by the context-parallel merge)


def _gather_patches(patches: jax.Array, idx: jax.Array) -> jax.Array:
    """take_along_axis on axis 1 for arbitrary trailing dims."""
    expand = idx.reshape(idx.shape + (1,) * (patches.ndim - 2))
    return jnp.take_along_axis(
        patches, expand.astype(jnp.int32), axis=1)


def select_top_m(emb: jax.Array, emb_to_score: jax.Array, idx: jax.Array,
                 valid: jax.Array, M: int, score_fn: ScoreFn
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Score L candidates, keep the top M.

    Scoring uses `emb_to_score` (embeddings + pos enc); the buffer keeps the
    raw `emb` (reference ips_net.py:136-155). Invalid candidates score -inf.
    """
    scores = score_fn(emb_to_score, valid)               # (B, L)
    scores = jnp.where(valid, scores, NEG_INF)
    top_val, top_pos = jax.lax.top_k(scores, M)          # (B, M), stable ties
    top_pos = top_pos.astype(jnp.int32)
    mem_emb = jnp.take_along_axis(emb, top_pos[..., None], axis=1)
    mem_idx = jnp.take_along_axis(idx, top_pos, axis=1)
    # Validity rides the score: invalid candidates score exactly NEG_INF
    # (the where above) while valid scores are softmax means in [0, 1], so
    # the kept values identify the kept mask — equal to gathering `valid`
    # by top_pos, without a 1-byte-row gather (measured 0.8 ms at camelyon
    # scale, ~10 ns per gathered element regardless of width).
    mem_valid = top_val > (0.5 * NEG_INF)
    return mem_emb, mem_idx, mem_valid


def ips_select(encode_fn: EncodeFn, score_fn: ScoreFn, patches: jax.Array,
               *, M: int, I: int, pos_table: Optional[jax.Array] = None,
               mask: Optional[jax.Array] = None,
               rng: Optional[jax.Array] = None, shuffle: bool = False,
               shuffle_style: str = "batch",
               return_emb: bool = False,
               prepermute: Optional[bool] = None,
               preencode: bool = False,
               preencode_chunked: bool = False,
               unroll: int = 1,
               encode_wrap: Optional[Callable[[EncodeFn, jax.Array],
                                              jax.Array]] = None
               ) -> SelectionResult:
    """Iterative Patch Selection over a resident (eager) patch tensor.

    Args:
      encode_fn: eval-mode encoder closure, (B, n, ...) -> (B, n, D).
      score_fn: deterministic scorer, ((B, L, D), (B, L) mask) -> (B, L).
      patches: (B, N, ...) patch tensor in HBM.
      pos_table: optional (N, D) positional table (indexed by original id).
      mask: optional (B, N) bool validity for variable-N (bucketed) data.
      rng, shuffle, shuffle_style: tie-break randomization.
      preencode: encode ALL N patches in ONE batched call up front and scan
        over cached embedding rows instead of encoding per chunk. Exactly
        the same selection (encoding is per-patch; only *scoring* is
        set-dependent, and the scan's candidate sets are unchanged), but
        one big conv dispatch instead of n_iter+1 sequential ones, and the
        per-chunk (I, ph, pw, C) patch gathers become (I, D) embedding-row
        gathers. Costs an extra (B, N, D) embedding table in HBM, so it is
        for the eager path only (streaming keeps the chunked encode).
      unroll: lax.scan unroll factor (semantics-identical). Chunk k+1's
        encode is independent of chunk k's top-M buffer, so an unrolled
        scan lets XLA overlap iteration k's small ops (scoring, top_k,
        gathers, concats) with iteration k+1's convs instead of
        serializing them at every carry boundary.
      encode_wrap: optional (encode_fn, x) -> emb wrapper applied at every
        selection encode. Exact context parallelism uses it to shard each
        chunk's patch axis over the mesh's `patch` axis for the encode and
        re-replicate the (B, n, D) embeddings for scoring — encoding is
        per-patch, so the wrap CANNOT change numerics, only placement
        (ShardedIPSTrainer._selection_encode_wrap).
    """
    B, N = patches.shape[:2]

    if encode_wrap is not None:
        base_encode_fn = encode_fn

        def encode_fn(x):  # noqa: F811 - deliberate placement shadow
            return encode_wrap(base_encode_fn, x)

    if mask is None:
        full_mask = jnp.ones((B, N), dtype=bool)
    else:
        full_mask = mask

    # Shortcut: no selection needed (reference ips_net.py:184-188).
    # Note the reference returns *unshuffled* patches here — shuffling
    # happens after this check — so we do the same.
    if M >= N:
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        pos = (jnp.broadcast_to(pos_table[None, :N], (B, N, pos_table.shape[-1]))
               if pos_table is not None else None)
        emb = encode_fn(patches) if return_emb else None
        return SelectionResult(patches, pos, idx, full_mask, emb)

    perm = make_permutation(rng, B, N, mask, shuffle, shuffle_style)

    # Pad the *index space* (not the patch tensor) so every chunk has size I.
    n_iter = -(-(N - M) // I)                       # ceil
    n_pad = M + n_iter * I - N
    if n_pad:
        perm = jnp.concatenate(
            [perm, jnp.zeros((B, n_pad), jnp.int32)], axis=1)
    # make_permutation guarantees every valid patch precedes every padded
    # slot (tested: tests/test_selection.py), so validity along the
    # permuted order is position < n_valid — computing it this way instead
    # of take_along_axis(full_mask, perm) removes a (B, N) boolean gather
    # that costs ~10 ns/element (1.6 ms at camelyon scale) for 1-byte rows.
    n_valid = jnp.sum(full_mask, axis=1, dtype=jnp.int32)          # (B,)
    perm_valid = (jnp.arange(N + n_pad, dtype=jnp.int32)[None, :]
                  < n_valid[:, None])

    # Optional: physically permute once and slice chunks contiguously
    # instead of gathering per iteration. Semantically identical (tested);
    # measured NEUTRAL on v5e at N<=7200 (XLA overlaps the in-scan gathers
    # with compute), so it stays off unless requested — it may pay on
    # hardware where gathers are not hidden, at the cost of one extra
    # (B, N, ...) HBM copy.
    if prepermute is None:
        prepermute = False
    patches_seq = _gather_patches(patches, perm) if prepermute else None

    # Pre-encode: encode ALL N patches in natural order into a (B, N, D)
    # table, then ONE permutation gather — the scan slices contiguous rows
    # instead of gathering per chunk (at camelyon scale the table exceeds
    # VMEM too, and 35 small in-scan gathers cost ~7 ms where the single
    # sequential gather is bandwidth-bound).
    #
    # preencode_chunked: build the table with a scan of contiguous-slice
    # encodes instead of one batched dispatch. REQUIRED for conv (image)
    # encoders at scale: a one-shot encode materializes every intermediate
    # activation for all B*N patches at once — at camelyon-e2e scale
    # (160k 50x50 tiles, or 224x224 tiles) that is several GB to tens of
    # GB of layer-1 activations, while chunked encoding keeps activation
    # memory at one I-chunk. Identical numerics (encoding is per-patch).
    emb_seq = None
    if preencode:
        if preencode_chunked and N > I:
            n_enc = -(-N // I)
            n_pad_enc = n_enc * I - N
            p_pad = (jnp.concatenate(
                [patches, jnp.zeros((B, n_pad_enc) + patches.shape[2:],
                                    patches.dtype)], axis=1)
                if n_pad_enc else patches)

            def enc_body(_, start):
                chunk = jax.lax.dynamic_slice_in_dim(p_pad, start, I, axis=1)
                return None, encode_fn(chunk)

            _, ys = jax.lax.scan(
                enc_body, None,
                jnp.arange(n_enc, dtype=jnp.int32) * I)   # (C, B, I, D)
            emb_table = jnp.moveaxis(ys, 0, 1).reshape(
                B, n_enc * I, -1)[:, :N]
        else:
            emb_table = encode_fn(patches)
        emb_seq = _gather_patches(emb_table, perm)

    def chunk_emb(idx, start):
        if preencode:
            return jax.lax.dynamic_slice_in_dim(
                emb_seq, start, idx.shape[1], axis=1)
        if prepermute:
            return encode_fn(jax.lax.dynamic_slice_in_dim(
                patches_seq, start, idx.shape[1], axis=1))
        return encode_fn(_gather_patches(patches, idx))

    # Init buffer with the first M (post-shuffle) patches
    # (reference ips_net.py:203-214).
    init_idx = perm[:, :M]
    init_valid = perm_valid[:, :M]
    init_emb = chunk_emb(init_idx, 0)

    def body(carry, start):
        mem_emb, mem_idx, mem_valid = carry
        cand_idx = jax.lax.dynamic_slice_in_dim(perm, start, I, axis=1)
        cand_valid = jax.lax.dynamic_slice_in_dim(perm_valid, start, I, axis=1)
        cand_emb = chunk_emb(cand_idx, start)

        all_emb = jnp.concatenate([mem_emb, cand_emb], axis=1)
        all_idx = jnp.concatenate([mem_idx, cand_idx], axis=1)
        all_valid = jnp.concatenate([mem_valid, cand_valid], axis=1)

        if pos_table is not None:
            # Score with positions added; keep raw embeddings in the buffer
            # (reference ips_net.py:233-241).
            emb_to_score = all_emb + pos_table[all_idx]
        else:
            emb_to_score = all_emb

        new_carry = select_top_m(all_emb, emb_to_score, all_idx, all_valid,
                                 M, score_fn)
        return new_carry, None

    starts = M + jnp.arange(n_iter, dtype=jnp.int32) * I
    (mem_emb, mem_idx, mem_valid), _ = jax.lax.scan(
        body, (init_emb, init_idx, init_valid), starts,
        unroll=max(1, min(unroll, n_iter)))

    mem_patch = _gather_patches(patches, mem_idx)
    mem_pos = pos_table[mem_idx] if pos_table is not None else None

    mem_patch = jax.lax.stop_gradient(mem_patch)
    if mem_pos is not None:
        mem_pos = jax.lax.stop_gradient(mem_pos)
    return SelectionResult(mem_patch, mem_pos, mem_idx, mem_valid,
                           mem_emb if return_emb else None)


def ips_select_streaming_step(encode_fn: EncodeFn, score_fn: ScoreFn,
                              mem_emb: jax.Array, mem_idx: jax.Array,
                              mem_valid: jax.Array, chunk: jax.Array,
                              chunk_idx: jax.Array, chunk_valid: jax.Array,
                              M: int,
                              pos_table: Optional[jax.Array] = None):
    """One selection iteration over a host-streamed chunk (lazy loading).

    Jit this once; a host loop feeds (chunk, chunk_idx) pairs via
    double-buffered device_put — the TPU-native analog of the reference's
    per-chunk `.to(device)` lazy path (reference ips_net.py:223).
    """
    cand_emb = encode_fn(chunk)
    all_emb = jnp.concatenate([mem_emb, cand_emb], axis=1)
    all_idx = jnp.concatenate([mem_idx, chunk_idx], axis=1)
    all_valid = jnp.concatenate([mem_valid, chunk_valid], axis=1)
    if pos_table is not None:
        emb_to_score = all_emb + pos_table[all_idx]
    else:
        emb_to_score = all_emb
    return select_top_m(all_emb, emb_to_score, all_idx, all_valid, M, score_fn)
