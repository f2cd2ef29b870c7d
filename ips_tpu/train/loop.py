"""Epoch loops: loader-batch IPS -> optimizer-batch assembly -> update.

Mirrors the reference's decoupling of the loader batch ``B_seq`` from the
optimizer batch ``B`` (reference training/iterative.py:7-63,103-231), with
two TPU-first changes:

  * the last partial optimizer batch is zero-padded to shape (B, ...) with
    per-instance weights instead of reshaped (reference ``shrink_batch``,
    training/iterative.py:52-63) — so each step compiles exactly once;
  * when ``B_seq == B`` the selection and the update run inside ONE jitted
    function (``IPSTrainer.fused_step``), eliminating the host round-trip.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ips_tpu.config import Config
from ips_tpu.train.schedule import warmup_cosine_lr
from ips_tpu.train.steps import IPSTrainer
from ips_tpu.utils.profiling import EfficiencyTracker


def _labels_from_batch(conf: Config, batch: Dict[str, np.ndarray]
                       ) -> Dict[str, np.ndarray]:
    """Host-side label arrays; trainer.put_batch places them on device."""
    labels = {}
    for t in conf.task_list:
        arr = np.asarray(batch[t.name])
        if t.metric == "multilabel_accuracy":
            labels[t.name] = np.asarray(arr, np.float32)
        else:
            labels[t.name] = np.asarray(arr, np.int32)
    return labels


def _pad_axis0(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


class BatchAssembler:
    """Accumulates B_seq-sized IPS outputs into a (B, M, ...) train batch.

    Functional analog of init_batch/fill_batch/shrink_batch
    (reference training/iterative.py:7-63).
    """

    def __init__(self, conf: Config):
        self.conf = conf
        self.reset()

    def reset(self):
        self._patches, self._pos, self._masks = [], [], []
        self._weights: list = []
        self._labels: Dict[str, list] = {t.name: []
                                         for t in self.conf.task_list}
        self.n_prep = 0

    def add(self, mem_patch, mem_pos, mem_mask, labels, row_weights=None):
        self._patches.append(mem_patch)
        if mem_pos is not None:
            self._pos.append(mem_pos)
        self._masks.append(mem_mask)
        n = mem_patch.shape[0]
        self._weights.append(np.ones(n, np.float32) if row_weights is None
                             else np.asarray(row_weights, np.float32))
        for k, v in labels.items():
            self._labels[k].append(v)
        self.n_prep += n

    @property
    def full(self) -> bool:
        return self.n_prep >= self.conf.B

    def take(self):
        """Concatenate + pad to B; returns (patch, pos, mask, labels, weights)."""
        B = self.conf.B
        n = self.n_prep
        patch = _pad_axis0(jnp.concatenate(self._patches, axis=0), B)
        pos = (_pad_axis0(jnp.concatenate(self._pos, axis=0), B)
               if self._pos else None)
        mask = _pad_axis0(jnp.concatenate(self._masks, axis=0), B)
        labels = {k: _pad_axis0(jnp.concatenate(v, axis=0), B)
                  for k, v in self._labels.items()}
        weights = jnp.asarray(
            np.concatenate([np.concatenate(self._weights),
                            np.zeros(B - n, np.float32)]))
        self.reset()
        return patch, pos, mask, labels, weights


_FETCH_POOL = None


def _fetch(tree):
    """Device->host copy of a result pytree in ONE latency window.

    On remote-attached TPUs every np.asarray of a device array is a
    blocking RPC (~40 ms through a tunnel); fetching the step results
    leaf-by-leaf made metric logging — not compute — dominate epoch wall
    time (measured: ~0.3 s/step for a 9-leaf result tree). Fetching the
    leaves concurrently on a small thread pool collapses that to one
    round trip; values are bit-identical. Local backends are unaffected
    (np.asarray is microseconds there)."""
    global _FETCH_POOL
    leaves, treedef = jax.tree.flatten(tree)
    n_dev = sum(isinstance(l, jax.Array) for l in leaves)
    if n_dev > 1:
        if _FETCH_POOL is None:
            from concurrent.futures import ThreadPoolExecutor
            _FETCH_POOL = ThreadPoolExecutor(max_workers=8,
                                             thread_name_prefix="ips-fetch")
        futs = [_FETCH_POOL.submit(np.asarray, l)
                if isinstance(l, jax.Array) else None for l in leaves]
        leaves = [f.result() if f is not None else l
                  for f, l in zip(futs, leaves)]
    else:
        leaves = [np.asarray(l) if isinstance(l, jax.Array) else l
                  for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _to_host(task_losses, preds):
    task_losses, preds = _fetch((task_losses, preds))
    tl = {k: float(v) for k, v in task_losses.items()}
    pr = {k: np.asarray(v) for k, v in preds.items()}
    return tl, pr


def _stage_slot_impl(stack, x, j):
    return jax.lax.dynamic_update_slice_in_dim(stack, x[None], j, axis=0)


_stage_slot = jax.jit(_stage_slot_impl, donate_argnums=0)


class _GroupStager:
    """Stages dispatch groups into reusable (K, ...) device stacks in
    place.

    ``jnp.stack`` of K prepared batches briefly holds the K per-item
    buffers AND the stacked copy — a 2x-group-size HBM transient that is
    what bounded steps_per_dispatch on 16 GB chips (RESULTS.md camelyon
    K-sweep). Here each item is written into slot j of a persistent
    stack buffer as it arrives (donated dynamic_update_slice: true
    in-place on TPU), and the item's own buffer is dropped immediately,
    so peak extra memory is one stack + one item.

    TWO rotating buffers per (name, shape, dtype) (parity flips at each
    dispatch-group boundary): donating a stack whose previous dispatch
    may still hold it cannot alias in place, so single-buffer staging
    loses the pipeline — measured same-day A/B at camelyon feature
    scale: driver/dispatch 2.31x (single) vs ~1.0x (rotating) at K=4
    (results/wall_residual_probe.json; RESULTS.md "single-buffer
    follow-up"). The rotation's cost is a second resident stack
    (group-size HBM: ~5.2 GB at camelyon K=8), which is what bounds
    steps_per_dispatch on 16 GB chips.

    Single-device trainers only — sharded arrays keep the jnp.stack
    path (a fresh zeros buffer would not carry the mesh sharding).
    """

    def __init__(self, K: int, rotating: bool = True):
        self.K = K
        self.parity = 0
        self.rotating = rotating
        self._bufs: dict = {}

    def rotate(self):
        """Call once per dispatch-group boundary."""
        if self.rotating:
            self.parity ^= 1

    def stage(self, name: str, j: int, x) -> tuple:
        """Write x into slot j of this parity's stack for `name`;
        returns an opaque slot handle for later retrieval."""
        key = (name, tuple(x.shape), jnp.result_type(x).name, self.parity)
        buf = self._bufs.get(key)
        if buf is None or buf.shape != (self.K,) + tuple(x.shape):
            buf = jnp.zeros((self.K,) + tuple(x.shape), x.dtype)
        self._bufs[key] = _stage_slot(buf, x, j)
        return (key, j)

    def stack(self, handle) -> jnp.ndarray:
        """The full (K, ...) stack containing `handle`."""
        return self._bufs[handle[0]]

    def slot(self, handle) -> jnp.ndarray:
        """One staged item (fallback/single dispatch path)."""
        return self._bufs[handle[0]][handle[1]]


def _stager_for(trainer, conf) -> Optional["_GroupStager"]:
    """In-place staging is for single-device trainers; mesh-sharded
    arrays keep jnp.stack (sharding-preserving)."""
    if conf.steps_per_dispatch <= 1:
        return None
    if getattr(trainer, "mesh", None) is not None:
        return None
    return _GroupStager(conf.steps_per_dispatch)


class _FetchPipeline:
    """One-deep dispatch/fetch pipeline for grouped epochs.

    The grouped drivers used to block on the ~40 ms/leaf result fetch
    (see _fetch) before issuing the next dispatch, so every dispatch
    paid fetch latency + issue latency serially — the measured ~16 ms
    per-dispatch wall residual at camelyon scale (RESULTS.md). Here the
    next group is dispatched BEFORE the previous group's results are
    pulled, overlapping the host round trip with device compute.
    Results are consumed strictly FIFO, so logging order — and
    therefore every metric — is unchanged.
    """

    def __init__(self, depth: int = 1):
        self.depth = max(depth, 0)
        self._q: list = []

    def push(self, payload, consume_fn):
        self._q.append((payload, consume_fn))
        while len(self._q) > self.depth:
            self.pop()

    def pop(self):
        payload, consume_fn = self._q.pop(0)
        consume_fn(payload)

    def drain(self):
        while self._q:
            self.pop()


def _batch_mask(batch: Dict[str, np.ndarray], B: int, N: int):
    """Host-side mask; device placement happens in trainer.put_batch
    (staging through the default device first would double the transfer
    under a mesh)."""
    if "mask" in batch:
        return np.asarray(batch["mask"], bool)
    return np.ones((B, N), dtype=bool)


def _maybe_log_step(conf: Config, data_it: int, loss, lr: float):
    """Optional per-step stdout logging (conf.log_every; forces a sync)."""
    if conf.log_every and (data_it + 1) % conf.log_every == 0:
        print(f"step {data_it + 1}: loss {float(loss):.5f}, lr {lr:.3g}",
              flush=True)


def _local_rows(conf: Config, global_rows: int) -> int:
    """This process's share of a global batch dimension. Multi-host runs
    load only batch/process_count rows per process (process-sharded
    DataLoader); single-process runs load everything."""
    return global_rows // jax.process_count()


def _pad_loader_batch(conf: Config, batch: Dict[str, np.ndarray]):
    """Zero-pad a partial last loader batch up to B_seq (this process's
    B_seq/process_count share under multi-host).

    Keeps every jitted step at ONE compiled shape (the reference instead
    runs a differently-shaped forward for the last batch,
    training/iterative.py:52-63 — on TPU that would be a multi-minute
    recompile). Returns (batch, row_weights); padded rows carry weight 0
    and an all-False patch mask so they can never contribute to selection,
    loss, or metrics.
    """
    ref_key = "input" if "input" in batch else "input_idx"
    n = batch[ref_key].shape[0]
    B_seq = _local_rows(conf, conf.B_seq)
    weights = np.ones(n, np.float32)
    if n == B_seq:
        return batch, weights
    pad = B_seq - n
    N = batch["input"].shape[1] if "input" in batch else conf.N
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        out[k] = np.concatenate(
            [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
    if "mask" not in batch:
        out["mask"] = np.concatenate(
            [np.ones((n, N), bool), np.zeros((pad, N), bool)])
    return out, np.concatenate([weights, np.zeros(pad, np.float32)])


def _resolve_sparse(conf: Config, trainer: IPSTrainer,
                    batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """sparse_input path: densify (idx, val) into patches ON DEVICE."""
    if not conf.sparse_input or "input" in batch:
        return batch
    hw = tuple(int(v) for v in np.asarray(batch["img_hw"])[0])
    batch = dict(batch)
    batch["input"] = trainer.densify(batch.pop("input_idx"),
                                     batch.pop("input_val"), hw)
    batch.pop("img_hw", None)
    return batch


def _put_select(trainer, patches, mask):
    """Place selection inputs: (B, N, ...) sharded (data, patch) on a mesh."""
    out = trainer.put_batch({"p": patches, "m": mask}, patch_dim=1)
    return out["p"], out["m"]


def _put_train(trainer, patch, pos, mmask, labels, weights):
    """Place an assembled (B, M, ...) train/eval batch (data axis only)."""
    out = trainer.put_batch({"patch": patch, "pos": pos, "mask": mmask,
                             "labels": labels, "w": weights})
    return out["patch"], out["pos"], out["mask"], out["labels"], out["w"]


def _log_train_step(conf, tracker, logger, epoch, data_it, is_last, lr,
                    loss, task_losses, preds, labels, weights):
    """Shared post-step bookkeeping: tracker, optional step log, metrics."""
    tracker.stop((loss, preds), epoch, data_it, is_last)
    _maybe_log_step(conf, data_it, loss, lr)
    tl, pr = _to_host(task_losses, preds)
    logger.update(tl, pr, {k: np.asarray(v) for k, v in labels.items()},
                  weights=np.asarray(weights))


def _prefetched(iterable, prepare, depth: int):
    """Yield prepare(item) while keeping up to `depth` prepared items in
    flight.

    `prepare` issues the (asynchronous) jax.device_put calls, so batch
    k+1's host->HBM transfer overlaps batch k's device step — the
    reference serializes transfer and compute per batch
    (training/iterative.py:118-121). Numerics are untouched: preparation
    is keyed on the iteration index, not on consumption order.
    """
    from collections import deque
    buf = deque()
    for item in iterable:
        buf.append(prepare(item))
        if len(buf) >= max(depth, 1):
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class _Prepped(NamedTuple):
    """One loader batch after prepare: device placements issued, host
    labels/weights retained for metric logging."""
    it: int
    payload: dict           # path-specific device arrays
    labels: dict            # host label arrays
    row_weights: "np.ndarray"
    rng: "jax.Array"


def _prep_fused(trainer, conf, base_rng, it, batch):
    """Everything up to (and including) the async device placement for one
    eager fused-path loader batch.

    Multi-host: `batch` holds this process's LOCAL rows; put_batch
    assembles the global sharded arrays, and the host label/weight copies
    kept for metric logging are allgathered so they line up with the
    replicated preds the jitted step returns."""
    rng = trainer.put_replicated(jax.random.fold_in(base_rng, it))
    batch, row_weights = _pad_loader_batch(conf, batch)
    B_seq, N = batch["input"].shape[:2]
    labels = _labels_from_batch(conf, batch)
    patches, mask = _put_select(trainer, batch["input"],
                                _batch_mask(batch, B_seq, N))
    put = trainer.put_batch({"labels": labels, "w": row_weights})
    if jax.process_count() > 1:
        from ips_tpu.parallel.distributed import host_allgather
        labels, row_weights = host_allgather((labels, row_weights))
    return _Prepped(it, {"patches": patches, "mask": mask, "put": put},
                    labels, row_weights, rng)


def _prep_assembled_mh(trainer, conf, base_rng, it, batch, steps_seq,
                       epoch, train: bool):
    """One OPTIMIZER batch under multi-host B_seq < B (the reference's
    default camelyon shape, reference config/camelyon_config.yml:4-5).

    The process-sharded DataLoader runs at optimizer-batch granularity
    (batch_size=B, main.build_loaders): this process's local `batch` is
    its contiguous B/P rows of global optimizer batch `it`, i.e. its
    r/P loader-slots of B_seq rows (r = B/B_seq; requires r % P == 0).
    The global (r, B_seq, N, ...) payload shards slot-major over `data`
    (ShardedIPSTrainer.put_assembled), so each host's slots stay on its
    own devices and the flattened B-row train batch lands r-major —
    exactly matching the `dat`-sharded labels.

    rng/lr sequences equal the single-process legacy schedule's: global
    slot g = it*r + j is "loader batch g" there, so selection rng_j =
    fold_in(base, g), the train rng folds the LAST slot's key, and the lr
    uses the last slot's B_seq-unit step index (steps_seq = B_seq-unit
    steps per epoch).
    """
    n_proc = jax.process_count()
    r = conf.B // conf.B_seq
    rows = batch["input"].shape[0]
    if rows != conf.B // n_proc:
        # process-sharded loaders force drop_last, so every yielded batch
        # is full-size; anything else is a wiring bug — fail loud
        raise ValueError(
            f"multi-host assembled: expected {conf.B // n_proc} local "
            f"rows, got {rows}")
    r_loc = r // n_proc
    N = batch["input"].shape[1]

    slot0 = epoch * steps_seq + it * r
    sel_keys = jnp.stack([jax.random.fold_in(base_rng, it * r + j)
                          for j in range(r)])
    labels = _labels_from_batch(conf, batch)
    row_weights = np.ones(rows, np.float32)
    mask = _batch_mask(batch, rows, N)

    x = np.asarray(batch["input"])
    payload = trainer.put_assembled({
        "p": x.reshape((r_loc, conf.B_seq) + x.shape[1:]),
        "m": np.asarray(mask).reshape(r_loc, conf.B_seq, N)})
    put = trainer.put_batch({"labels": labels, "w": row_weights})
    sk = trainer.put_replicated(sel_keys)
    item = {"p": payload["p"], "m": payload["m"],
            "lab": put["labels"], "w": put["w"], "sk": sk, "it": it}
    if train:
        item["tk"] = trainer.put_replicated(
            jax.random.fold_in(jax.random.fold_in(base_rng,
                                                  it * r + r - 1), 1))
        item["lr"] = warmup_cosine_lr(slot0 + r, steps_seq, conf.n_epoch,
                                      conf.n_epoch_warmup, conf.lr)
    from ips_tpu.parallel.distributed import host_allgather
    item["host_lab"], item["host_w"] = host_allgather((labels, row_weights))
    return item


def _flush_assembled_mh(trainer, conf, logger, items, train: bool,
                        epoch: int, steps_seq: int):
    """Dispatch pending multi-host assembled optimizer/eval batches: one
    K-stacked dispatch for a full homogeneous group, singles otherwise
    (bucket shape changes and the epoch tail)."""
    if not items:
        return
    K = conf.steps_per_dispatch

    def log_item(i, loss, task_losses, preds):
        if train:
            _maybe_log_step(conf, epoch * steps_seq + (i["it"] + 1) * conf.B
                            // conf.B_seq - 1, loss, i.get("lr", 0.0))
        tl, pr = _to_host(task_losses, preds)
        logger.update(tl, pr,
                      {k: np.asarray(v) for k, v in i["host_lab"].items()},
                      weights=np.asarray(i["host_w"]))

    shapes = {i["p"].shape for i in items}
    if len(items) == K and K > 1 and len(shapes) == 1:
        stack = lambda key: jnp.stack([i[key] for i in items])
        lab = {k: jnp.stack([i["lab"][k] for i in items])
               for k in items[0]["lab"]}
        if train:
            losses, task_losses, preds = trainer.fused_assembled_multi_step(
                stack("p"), stack("m"), lab, stack("w"), stack("sk"),
                stack("tk"), jnp.asarray([i["lr"] for i in items]))
        else:
            losses, task_losses, preds = \
                trainer.fused_assembled_eval_multi_step(
                    stack("p"), stack("m"), lab, stack("w"), stack("sk"))
        # one round trip for the whole stacked result tree (see _fetch)
        losses, task_losses, preds = _fetch((losses, task_losses, preds))
        for j, i in enumerate(items):
            log_item(i, losses[j], {k: v[j] for k, v in task_losses.items()},
                     {k: v[j] for k, v in preds.items()})
        return
    for i in items:
        if train:
            loss, task_losses, preds = trainer.fused_assembled_step(
                i["p"], i["m"], i["lab"], i["w"], i["sk"], i["tk"], i["lr"])
        else:
            loss, task_losses, preds = trainer.fused_assembled_eval_step(
                i["p"], i["m"], i["lab"], i["w"], i["sk"])
        log_item(i, loss, task_losses, preds)


def _epoch_assembled_mh(trainer, loader, epoch, logger, conf, base_rng,
                        train: bool):
    """Multi-host driver for the B_seq < B shape, train and eval: every
    loader yield is one global optimizer batch; K homogeneous batches
    group into one dispatch (any bucket-shape change flushes early to
    keep the update order)."""
    r = conf.B // conf.B_seq
    K = conf.steps_per_dispatch
    steps_seq = len(loader) * r
    prep = lambda ib: _prep_assembled_mh(trainer, conf, base_rng, ib[0],
                                         ib[1], steps_seq, epoch, train)
    last_lr = 0.0
    pending = []

    def flush():
        nonlocal last_lr, pending
        if pending:
            _flush_assembled_mh(trainer, conf, logger, pending, train,
                                epoch, steps_seq)
            last_lr = pending[-1].get("lr", last_lr)
            pending = []

    for item in _prefetched(enumerate(loader), prep,
                            max(conf.prefetch_depth, K + 1)):
        if pending and pending[-1]["p"].shape != item["p"].shape:
            flush()
        pending.append(item)
        if len(pending) == K:
            flush()
    flush()
    return last_lr


def _yields_sparse(loader) -> bool:
    """Does the loader's dataset emit (input_idx, input_val) samples?

    Probed ONCE per loader on the dataset (not the loader iterator, which
    would consume a shuffle order) and cached on the loader object — a
    per-epoch ds[0] materialization would be wasted work and could
    disagree with itself on nondeterministic datasets. Mixed datasets are
    handled per batch anyway: _prep_sparse degrades dense batches to the
    dense path (kind='dense') instead of raising mid-epoch.
    """
    cached = getattr(loader, "_ips_yields_sparse", None)
    if cached is not None:
        return cached
    ds = getattr(loader, "dataset", None)
    try:
        result = ds is not None and len(ds) > 0 and "input_idx" in ds[0]
    except Exception:
        result = False
    try:
        loader._ips_yields_sparse = result
    except AttributeError:
        pass
    return result


def _use_pipeline(conf: Config) -> bool:
    """Eager fused path: one code path for every prefetch_depth
    (depth 1 = prepare-then-consume, i.e. the serial schedule)."""
    return conf.eager and conf.B_seq == conf.B and not conf.sparse_input


def _train_epoch_grouped(trainer, loader, epoch, logger, conf,
                         base_rng, steps_per_epoch):
    """steps_per_dispatch > 1 on the dense eager path: K fused steps per
    device dispatch — identical update sequence (same per-step rng/lr as
    `_train_epoch_pipelined` would use), per-dispatch overhead paid once
    per K steps."""
    prep = lambda ib: _prep_fused(trainer, conf, base_rng, ib[0], ib[1])

    def dispatch_multi(big, group, lrs):
        puts = [p.payload["put"] for p in group]
        return trainer.fused_multi_step(
            big["patches"], big["mask"],
            {k: jnp.stack([q["labels"][k] for q in puts])
             for k in puts[0]["labels"]},
            jnp.stack([q["w"] for q in puts]),
            jnp.stack([p.rng for p in group]), jnp.asarray(lrs))

    def dispatch_single(p, lr):
        q = p.payload
        return trainer.fused_step(q["patches"], q["mask"],
                                  q["put"]["labels"], q["put"]["w"], p.rng,
                                  lr)

    return _grouped_epoch(loader, epoch, logger, conf, base_rng,
                          steps_per_epoch, prep, dispatch_multi,
                          dispatch_single,
                          group_key=lambda p: p.payload["patches"].shape,
                          big_keys=("patches", "mask"),
                          stager=_stager_for(trainer, conf))


def _prep_sparse(trainer, conf, base_rng, it, batch):
    """Prepare one sparse fast-path loader batch (async device placement).

    A batch that arrives dense despite sparse_input=true (a mixed or
    mislabeled dataset) degrades to the dense path FOR THAT BATCH — the
    same way the K=1 per-batch check degrades — instead of failing the
    epoch; its payload is marked kind='dense' and the grouped drivers
    dispatch it as a single step."""
    if "input_idx" not in batch:
        p = _prep_fused(trainer, conf, base_rng, it, batch)
        p.payload["kind"] = "dense"
        return p
    rng = trainer.put_replicated(jax.random.fold_in(base_rng, it))
    batch, row_weights = _pad_loader_batch(conf, batch)
    labels = _labels_from_batch(conf, batch)
    hw = tuple(int(v) for v in np.asarray(batch["img_hw"])[0])
    put = trainer.put_batch({"idx": batch["input_idx"],
                             "val": batch["input_val"],
                             "labels": labels, "w": row_weights})
    mask = trainer.put_batch(
        {"m": _batch_mask(batch, batch["input_idx"].shape[0], conf.N)},
        patch_dim=1)["m"]
    if jax.process_count() > 1:
        from ips_tpu.parallel.distributed import host_allgather
        labels, row_weights = host_allgather((labels, row_weights))
    # idx/val/mask sit at the payload top level so the grouped drivers
    # can stage them (big_keys) and drop the per-batch buffers
    return _Prepped(it, {"idx": put.pop("idx"), "val": put.pop("val"),
                         "put": put, "mask": mask, "hw": hw,
                         "kind": "sparse"}, labels, row_weights, rng)


def _grouped_epoch(loader, epoch, logger, conf, base_rng, steps_per_epoch,
                   prep, dispatch_multi, dispatch_single, group_key=None,
                   train=True, big_keys=(), stager=None):
    """Shared driver for steps_per_dispatch > 1 epochs.

    Stacks K prepared batches and dispatches once (`dispatch_multi`); a
    trailing group smaller than K — or one whose items disagree on
    `group_key` (e.g. image size) — falls back to the single-step jit
    (`dispatch_single`), so no zero-weight fake steps ever touch BN
    statistics or AdamW weight decay. The prefetch depth is raised to
    K+1 so the next group's host->HBM transfers stay in flight while the
    current dispatch runs (depth < K would serialize them behind the
    group sync).

    Wall-clock structure: payload entries named in ``big_keys`` are
    staged into persistent (K, ...) device stacks as items arrive
    (`_GroupStager` — no 2x jnp.stack transient, single-device
    trainers), and each group's result fetch is deferred until the NEXT
    group has been dispatched (`_FetchPipeline`), so the per-dispatch
    host round trip overlaps device compute. Update sequence, rng/lr
    schedules, and metric logging order are identical to the serial
    schedule.
    """
    K = conf.steps_per_dispatch
    last_lr = 0.0
    pipeline = _FetchPipeline(depth=0 if conf.track_efficiency else 1)

    def log_step(p, lr, loss, tl, pr):
        if train:
            _maybe_log_step(conf, epoch * steps_per_epoch + p.it, loss, lr)
        logger.update(tl, pr,
                      {k: np.asarray(v) for k, v in p.labels.items()},
                      weights=np.asarray(p.row_weights))

    def stage(p, j):
        """Move payload big arrays into slot j of the staging stacks."""
        p.payload["_gkey"] = group_key(p) if group_key is not None else None
        if stager is None:
            return
        staged = {}
        for name in big_keys:
            x = p.payload.get(name)
            if x is not None and isinstance(x, jax.Array):
                staged[name] = stager.stage(name, j, x)
                p.payload[name] = None
        p.payload["_staged"] = staged

    def materialize(p):
        """Restore staged arrays for a single-step (fallback) dispatch."""
        for name, handle in p.payload.pop("_staged", {}).items():
            p.payload[name] = stager.slot(handle)

    def big_stacks(group):
        if stager is not None and group[0].payload.get("_staged"):
            return {name: stager.stack(handle)
                    for name, handle in group[0].payload["_staged"].items()}
        return {name: jnp.stack([p.payload[name] for p in group])
                for name in big_keys}

    def consume(entry):
        group, lrs, res = entry
        # one round trip for the whole stacked result tree, sliced per
        # item on the host (per-item device slices would pay a ~40 ms
        # RPC per leaf on tunneled backends — see _fetch)
        losses, task_losses, preds = _fetch(res)
        for j, p in enumerate(group):
            tl = {k: float(v[j]) for k, v in task_losses.items()}
            pr = {k: v[j] for k, v in preds.items()}
            log_step(p, lrs[j], losses[j], tl, pr)

    def run_group(group):
        nonlocal last_lr
        if train:
            lrs = [warmup_cosine_lr(epoch * steps_per_epoch + p.it + 1,
                                    steps_per_epoch, conf.n_epoch,
                                    conf.n_epoch_warmup, conf.lr)
                   for p in group]
            last_lr = lrs[-1]
        else:
            lrs = [None] * len(group)
        homogeneous = len({p.payload["_gkey"] for p in group}) == 1
        if len(group) == K and homogeneous:
            res = dispatch_multi(big_stacks(group), group, lrs)
            pipeline.push((group, lrs, res), consume)
        else:
            pipeline.drain()  # keep metric/print order exact
            for j, p in enumerate(group):
                if stager is not None:
                    materialize(p)
                loss, task_losses, preds = dispatch_single(p, lrs[j])
                tl, pr = _to_host(task_losses, preds)
                log_step(p, lrs[j], loss, tl, pr)
        if stager is not None:
            stager.rotate()

    depth = max(conf.prefetch_depth, K + 1)
    group = []
    for item in _prefetched(enumerate(loader), prep, depth):
        stage(item, len(group))
        group.append(item)
        if len(group) == K:
            run_group(group)
            group = []
    if group:
        run_group(group)
    pipeline.drain()
    return last_lr


def _sparse_group_key(p):
    """Grouping key for sparse-path batches: sparse batches group by image
    size; dense-degraded batches get a unique key so they always dispatch
    as singles (there is no mixed multi-step jit)."""
    if p.payload["kind"] == "dense":
        return ("dense", p.it)
    return ("sparse",) + tuple(p.payload["hw"])


def _train_epoch_sparse_grouped(trainer, loader, epoch, logger, conf,
                                base_rng, steps_per_epoch):
    """steps_per_dispatch > 1 on the sparse fast path: K densify+select+
    train steps per dispatch."""
    prep = lambda ib: _prep_sparse(trainer, conf, base_rng, ib[0], ib[1])

    def dispatch_multi(big, group, lrs):
        puts = [p.payload["put"] for p in group]
        return trainer.fused_sparse_multi_step(
            big["idx"], big["val"], group[0].payload["hw"], big["mask"],
            {k: jnp.stack([q["labels"][k] for q in puts])
             for k in puts[0]["labels"]},
            jnp.stack([q["w"] for q in puts]),
            jnp.stack([p.rng for p in group]), jnp.asarray(lrs))

    def dispatch_single(p, lr):
        q = p.payload
        if q["kind"] == "dense":
            # per-batch dense degradation: exactly the K=1 general-loop
            # schedule (select with the batch rng, train with fold_in 1)
            mem_patch, mem_pos, _, mem_mask = trainer.select(
                q["patches"], q["mask"], p.rng)
            return trainer.train_step(
                mem_patch, mem_pos, mem_mask, q["put"]["labels"],
                q["put"]["w"], jax.random.fold_in(p.rng, 1), lr)
        return trainer.fused_sparse_step(
            q["idx"], q["val"], q["hw"], q["mask"],
            q["put"]["labels"], q["put"]["w"], p.rng, lr)

    return _grouped_epoch(loader, epoch, logger, conf, base_rng,
                          steps_per_epoch, prep, dispatch_multi,
                          dispatch_single, group_key=_sparse_group_key,
                          big_keys=("idx", "val", "mask"),
                          stager=_stager_for(trainer, conf))


def _train_epoch_assembled(trainer, loader, epoch, logger, conf,
                           base_rng, steps_per_epoch):
    """Eager dense B_seq < B (the reference's default camelyon shape,
    reference config/camelyon_config.yml:4-5 + training/iterative.py:7-63):
    r = B/B_seq loader batches become ONE fused dispatch (vmapped
    selections + the gradient step), and steps_per_dispatch > 1 groups K
    such optimizer steps per dispatch — versus the legacy loop's r
    selection dispatches + 1 train dispatch per optimizer step.

    The update sequence is IDENTICAL to the legacy select-assemble-train
    loop: each loader batch keeps its own selection rng
    (fold_in(base, it)), the train rng/lr derive from the optimizer
    batch's LAST loader batch exactly as the legacy path derives them.
    Heterogeneous r-groups (mixed variable-N buckets) and the epoch-end
    partial batch fall back to the legacy per-batch path, in order.
    """
    r = conf.B // conf.B_seq
    K = conf.steps_per_dispatch
    last_lr = 0.0
    prep = lambda ib: _prep_fused(trainer, conf, base_rng, ib[0], ib[1])
    stager = _stager_for(trainer, conf)
    pipeline = _FetchPipeline(depth=1)

    def log_opt_step(preps, lr, loss, task_losses, preds):
        _maybe_log_step(conf, epoch * steps_per_epoch + preps[-1].it, loss,
                        lr)
        tl, pr = _to_host(task_losses, preds)
        labels = {k: np.concatenate([np.asarray(p.labels[k]) for p in preps])
                  for k in preps[0].labels}
        weights = np.concatenate([p.row_weights for p in preps])
        logger.update(tl, pr, labels, weights=weights)

    def opt_item(preps, slot):
        """One optimizer-step payload from r homogeneous preps; its big
        (r, B_seq, ...) arrays go straight into dispatch-stack slot
        `slot` (no 2x jnp.stack transient at flush — see _GroupStager)."""
        puts = [p.payload["put"] for p in preps]
        lr = warmup_cosine_lr(epoch * steps_per_epoch + preps[-1].it + 1,
                              steps_per_epoch, conf.n_epoch,
                              conf.n_epoch_warmup, conf.lr)
        item = {
            "p": jnp.stack([p.payload["patches"] for p in preps]),
            "m": jnp.stack([p.payload["mask"] for p in preps]),
            "lab": {k: jnp.concatenate([q["labels"][k] for q in puts])
                    for k in puts[0]["labels"]},
            "w": jnp.concatenate([q["w"] for q in puts]),
            "sk": jnp.stack([p.rng for p in preps]),
            "tk": jax.random.fold_in(preps[-1].rng, 1),
            "lr": lr, "preps": preps, "shape": None,
        }
        for p in preps:
            p.payload["patches"] = p.payload["mask"] = None
        item["shape"] = item["p"].shape
        if stager is not None:
            item["hp"] = stager.stage("p", slot, item["p"])
            item["hm"] = stager.stage("m", slot, item["m"])
            item["p"] = item["m"] = None
        return item

    def consume(entry):
        items, res = entry
        # one round trip for the stacked result tree (see _fetch)
        losses, task_losses, preds = _fetch(res)
        for j, i in enumerate(items):
            log_opt_step(i["preps"], i["lr"], losses[j],
                         {k: v[j] for k, v in task_losses.items()},
                         {k: v[j] for k, v in preds.items()})

    def flush_items(items):
        """Dispatch pending optimizer steps: one K-stacked dispatch when a
        full homogeneous group (its result fetch deferred until the next
        dispatch is in flight — _FetchPipeline), else one dispatch each."""
        nonlocal last_lr
        if not items:
            return
        shapes = {i["shape"] for i in items}
        if len(items) == K and K > 1 and len(shapes) == 1:
            if stager is not None:
                big_p, big_m = (stager.stack(items[0]["hp"]),
                                stager.stack(items[0]["hm"]))
            else:
                big_p = jnp.stack([i["p"] for i in items])
                big_m = jnp.stack([i["m"] for i in items])
            res = trainer.fused_assembled_multi_step(
                big_p, big_m,
                {k: jnp.stack([i["lab"][k] for i in items])
                 for k in items[0]["lab"]},
                jnp.stack([i["w"] for i in items]),
                jnp.stack([i["sk"] for i in items]),
                jnp.stack([i["tk"] for i in items]),
                jnp.asarray([i["lr"] for i in items]))
            pipeline.push((items, res), consume)
        else:
            pipeline.drain()  # keep metric/print order exact
            for i in items:
                if stager is not None and "hp" in i:
                    i["p"], i["m"] = stager.slot(i["hp"]), stager.slot(i["hm"])
                loss, task_losses, preds = trainer.fused_assembled_step(
                    i["p"], i["m"], i["lab"], i["w"], i["sk"], i["tk"],
                    i["lr"])
                log_opt_step(i["preps"], i["lr"], loss, task_losses, preds)
        if stager is not None:
            stager.rotate()
        last_lr = items[-1]["lr"]

    def legacy_steps(preps):
        """Per-batch select + assembler + train (exact legacy semantics)
        for heterogeneous r-groups and the epoch-end partial batch."""
        nonlocal last_lr
        pipeline.drain()
        assembler = BatchAssembler(conf)
        for p in preps:
            mem_patch, mem_pos, _, mem_mask = trainer.select(
                p.payload["patches"], p.payload["mask"], p.rng)
            assembler.add(mem_patch, mem_pos, mem_mask, p.labels,
                          p.row_weights)
        patch, pos, mmask, lab, weights = _put_train(trainer,
                                                     *assembler.take())
        last_lr = warmup_cosine_lr(epoch * steps_per_epoch + preps[-1].it
                                   + 1, steps_per_epoch, conf.n_epoch,
                                   conf.n_epoch_warmup, conf.lr)
        loss, task_losses, preds = trainer.train_step(
            patch, pos, mmask, lab, weights,
            jax.random.fold_in(preps[-1].rng, 1), last_lr)
        tl, pr = _to_host(task_losses, preds)
        logger.update(tl, pr, {k: np.asarray(v) for k, v in lab.items()},
                      weights=np.asarray(weights))
        _maybe_log_step(conf, epoch * steps_per_epoch + preps[-1].it, loss,
                        last_lr)

    depth = max(conf.prefetch_depth, r * K + 1)
    pending, group = [], []
    for p in _prefetched(enumerate(loader), prep, depth):
        group.append(p)
        if len(group) < r:
            continue
        if len({q.payload["patches"].shape for q in group}) == 1:
            pending.append(opt_item(group, len(pending)))
            if len(pending) == K:
                flush_items(pending)
                pending = []
        else:
            # mixed buckets inside one optimizer batch: keep update order
            flush_items(pending)
            pending = []
            legacy_steps(group)
        group = []
    flush_items(pending)
    if group:                      # epoch-end partial optimizer batch
        legacy_steps(group)
    pipeline.drain()
    return last_lr


def _train_epoch_pipelined(trainer, loader, epoch, logger, conf, tracker,
                           base_rng, steps_per_epoch):
    last_lr = 0.0
    prep = lambda ib: _prep_fused(trainer, conf, base_rng, ib[0], ib[1])
    # defer each step's result fetch until the next step is dispatched, so
    # the ~40 ms host round trip overlaps device compute (_FetchPipeline);
    # track_efficiency keeps the serial schedule for exact per-step timing
    pipeline = _FetchPipeline(depth=0 if conf.track_efficiency else 1)

    def consume(entry):
        p, data_it, is_last, lr, res = entry
        loss, task_losses, preds = res
        _log_train_step(conf, tracker, logger, epoch, data_it, is_last,
                        lr, loss, task_losses, preds, p.labels,
                        p.row_weights)

    for p in _prefetched(enumerate(loader), prep, conf.prefetch_depth):
        data_it = epoch * steps_per_epoch + p.it
        is_last = p.it == steps_per_epoch - 1
        tracker.start()
        last_lr = warmup_cosine_lr(data_it + 1, steps_per_epoch,
                                   conf.n_epoch, conf.n_epoch_warmup,
                                   conf.lr)
        res = trainer.fused_step(
            p.payload["patches"], p.payload["mask"],
            p.payload["put"]["labels"], p.payload["put"]["w"], p.rng,
            last_lr)
        pipeline.push((p, data_it, is_last, last_lr, res), consume)
    pipeline.drain()
    tracker.finish_epoch(epoch)
    return last_lr


def train_one_epoch(trainer: IPSTrainer, loader, epoch: int, logger, conf: Config,
                    tracker: Optional[EfficiencyTracker] = None):
    """One training epoch (reference training/iterative.py:103-189)."""
    steps_per_epoch = len(loader)
    assembler = BatchAssembler(conf)
    base_rng = jax.random.PRNGKey(conf.seed * 1_000_003 + epoch)
    tracker = tracker or EfficiencyTracker(conf)
    last_lr = 0.0

    grouped = conf.steps_per_dispatch > 1 and not conf.track_efficiency
    # (track_efficiency keeps the K=1 paths so per-step timing stays exact)
    if (jax.process_count() > 1 and conf.eager and not conf.sparse_input
            and conf.B_seq < conf.B):
        # multi-host B_seq < B: the loader runs at optimizer-batch
        # granularity and every path is the fused assembled one (the
        # legacy host-side assembler is per-process state that cannot
        # span hosts) — any steps_per_dispatch
        return _epoch_assembled_mh(trainer, loader, epoch, logger, conf,
                                   base_rng, train=True)
    if _use_pipeline(conf):
        if grouped:
            return _train_epoch_grouped(trainer, loader, epoch, logger,
                                        conf, base_rng, steps_per_epoch)
        return _train_epoch_pipelined(trainer, loader, epoch, logger, conf,
                                      tracker, base_rng, steps_per_epoch)
    if (grouped and conf.sparse_input and conf.eager
            and conf.B_seq == conf.B and _yields_sparse(loader)):
        return _train_epoch_sparse_grouped(trainer, loader, epoch, logger,
                                           conf, base_rng, steps_per_epoch)
    if (grouped and conf.eager and not conf.sparse_input
            and conf.B_seq < conf.B):
        # steps_per_dispatch > 1 with B_seq < B: r loader batches per fused
        # dispatch, K optimizer steps per dispatch; exact legacy update
        # sequence (see _train_epoch_assembled). At K=1 the legacy
        # select-assemble-train schedule stays default: its dispatches
        # pipeline asynchronously, and at camelyon scale each B_seq=1
        # patch table fits VMEM, making it slightly FASTER than one big
        # dispatch (measured: results/camelyon_probe.json seq_b1 28.9 vs
        # assembled 35.1 ms/step) — the assembled path's win is grouping.
        return _train_epoch_assembled(trainer, loader, epoch, logger, conf,
                                      base_rng, steps_per_epoch)

    for it, batch in enumerate(loader):
        data_it = epoch * steps_per_epoch + it
        is_last = it == steps_per_epoch - 1
        rng = jax.random.fold_in(base_rng, it)

        batch, row_weights = _pad_loader_batch(conf, batch)

        # Sparse fast path: densify+select+train in ONE jitted dispatch.
        if (conf.sparse_input and "input_idx" in batch and conf.eager
                and conf.B_seq == conf.B):
            tracker.start()
            labels = _labels_from_batch(conf, batch)
            hw = tuple(int(v) for v in np.asarray(batch["img_hw"])[0])
            # LOCAL rows (B/process_count under multi-host), like
            # _prep_sparse — put_batch assembles the global mask
            mask = _batch_mask(batch, batch["input_idx"].shape[0], conf.N)
            last_lr = warmup_cosine_lr(data_it + 1, steps_per_epoch,
                                       conf.n_epoch, conf.n_epoch_warmup,
                                       conf.lr)
            put = trainer.put_batch({"idx": batch["input_idx"],
                                     "val": batch["input_val"],
                                     "labels": labels,
                                     "w": row_weights})
            mask = trainer.put_batch({"m": mask}, patch_dim=1)["m"]
            loss, task_losses, preds = trainer.fused_sparse_step(
                put["idx"], put["val"], hw, mask, put["labels"],
                put["w"], trainer.put_replicated(rng), last_lr)
            if jax.process_count() > 1:
                # preds come back replicated GLOBAL under multi-host; line
                # the host label/weight copies up for metric logging
                from ips_tpu.parallel.distributed import host_allgather
                labels, row_weights = host_allgather((labels, row_weights))
            _log_train_step(conf, tracker, logger, epoch, data_it, is_last,
                            last_lr, loss, task_losses, preds, labels,
                            row_weights)
            continue

        batch = _resolve_sparse(conf, trainer, batch)
        B_seq, N = batch["input"].shape[:2]
        labels = _labels_from_batch(conf, batch)

        if assembler.n_prep == 0:
            tracker.start()

        if not conf.eager:
            # Lazy mode: patches stay on host, chunks stream to HBM.
            mem_patch, mem_pos, _, mem_mask = trainer.select_streaming(
                batch["input"], batch.get("mask"), rng)
            assembler.add(mem_patch, mem_pos, mem_mask, labels, row_weights)
            if assembler.full or is_last:
                patch, pos, mmask, lab, weights = _put_train(
                    trainer, *assembler.take())
                data_it_lr = data_it + 1
                last_lr = warmup_cosine_lr(data_it_lr, steps_per_epoch,
                                           conf.n_epoch, conf.n_epoch_warmup,
                                           conf.lr)
                loss, task_losses, preds = trainer.train_step(
                    patch, pos, mmask, lab, weights,
                    jax.random.fold_in(rng, 1), last_lr)
                _log_train_step(conf, tracker, logger, epoch, data_it,
                                is_last, last_lr, loss, task_losses, preds,
                                lab, weights)
            continue

        patches, mask = _put_select(trainer, batch["input"],
                                    _batch_mask(batch, B_seq, N))

        mem_patch, mem_pos, _, mem_mask = trainer.select(patches, mask, rng)
        assembler.add(mem_patch, mem_pos, mem_mask, labels, row_weights)

        if assembler.full or is_last:
            patch, pos, mmask, lab, weights = _put_train(
                trainer, *assembler.take())
            last_lr = warmup_cosine_lr(data_it + 1, steps_per_epoch,
                                       conf.n_epoch, conf.n_epoch_warmup,
                                       conf.lr)
            loss, task_losses, preds = trainer.train_step(
                patch, pos, mmask, lab, weights,
                jax.random.fold_in(rng, 1), last_lr)
            _log_train_step(conf, tracker, logger, epoch, data_it, is_last,
                            last_lr, loss, task_losses, preds, lab, weights)

    tracker.finish_epoch(epoch)
    return last_lr


def _eval_pipelined(trainer, loader, logger, conf, base_rng):
    prep = lambda ib: _prep_fused(trainer, conf, base_rng, ib[0], ib[1])
    K = conf.steps_per_dispatch

    def log_one(p, tl, pr):
        logger.update(tl, pr,
                      {k: np.asarray(v) for k, v in p.labels.items()},
                      weights=p.row_weights)

    def consume_single(entry):
        p, res = entry
        _, task_losses, preds = res
        tl, pr = _to_host(task_losses, preds)
        log_one(p, tl, pr)

    if K <= 1:
        pipeline = _FetchPipeline(depth=1)
        for p in _prefetched(enumerate(loader), prep, conf.prefetch_depth):
            res = trainer.fused_eval_step(
                p.payload["patches"], p.payload["mask"],
                p.payload["put"]["labels"], p.payload["put"]["w"], p.rng)
            pipeline.push((p, res), consume_single)
        pipeline.drain()
        return

    # steps_per_dispatch > 1: K eval batches per dispatch through the
    # shared grouped driver (mixed-shape groups / short tails -> singles)
    def dispatch_multi(big, group, lrs):
        puts = [p.payload["put"] for p in group]
        return trainer.fused_eval_multi_step(
            big["patches"], big["mask"],
            {k: jnp.stack([q["labels"][k] for q in puts])
             for k in puts[0]["labels"]},
            jnp.stack([q["w"] for q in puts]),
            jnp.stack([p.rng for p in group]))

    def dispatch_single(p, lr):
        return trainer.fused_eval_step(
            p.payload["patches"], p.payload["mask"],
            p.payload["put"]["labels"], p.payload["put"]["w"], p.rng)

    _grouped_epoch(loader, 0, logger, conf, base_rng, len(loader),
                   prep, dispatch_multi, dispatch_single,
                   group_key=lambda p: p.payload["patches"].shape,
                   train=False, big_keys=("patches", "mask"),
                   stager=_stager_for(trainer, conf))


def _eval_sparse_pipelined(trainer, loader, logger, conf, base_rng):
    """Sparse fast-path eval: densify+select+eval in ONE dispatch per
    batch, K batches per dispatch when steps_per_dispatch > 1 (the train
    side's grouping, VERDICT r2 weak #7). Dense batches degrade to the
    fused dense eval as singles."""
    prep = lambda ib: _prep_sparse(trainer, conf, base_rng, ib[0], ib[1])

    def dispatch_single(p, lr):
        q = p.payload
        if q["kind"] == "dense":
            return trainer.fused_eval_step(q["patches"], q["mask"],
                                           q["put"]["labels"], q["put"]["w"],
                                           p.rng)
        return trainer.fused_sparse_eval_step(
            q["idx"], q["val"], q["hw"], q["mask"],
            q["put"]["labels"], q["put"]["w"], p.rng)

    if conf.steps_per_dispatch <= 1:
        pipeline = _FetchPipeline(depth=1)

        def consume_single(entry):
            p, (_, task_losses, preds) = entry
            tl, pr = _to_host(task_losses, preds)
            logger.update(tl, pr,
                          {k: np.asarray(v) for k, v in p.labels.items()},
                          weights=p.row_weights)

        for p in _prefetched(enumerate(loader), prep, conf.prefetch_depth):
            pipeline.push((p, dispatch_single(p, None)), consume_single)
        pipeline.drain()
        return

    def dispatch_multi(big, group, lrs):
        puts = [p.payload["put"] for p in group]
        return trainer.fused_sparse_eval_multi_step(
            big["idx"], big["val"], group[0].payload["hw"], big["mask"],
            {k: jnp.stack([q["labels"][k] for q in puts])
             for k in puts[0]["labels"]},
            jnp.stack([q["w"] for q in puts]),
            jnp.stack([p.rng for p in group]))

    _grouped_epoch(loader, 0, logger, conf, base_rng, len(loader),
                   prep, dispatch_multi, dispatch_single,
                   group_key=_sparse_group_key, train=False,
                   big_keys=("idx", "val", "mask"),
                   stager=_stager_for(trainer, conf))


def _eval_assembled(trainer, loader, logger, conf, base_rng):
    """Eager dense B_seq < B eval: r loader batches -> ONE fused dispatch
    (vmapped selections + eval forward), K such batches per dispatch when
    steps_per_dispatch > 1. Same selection rngs as the legacy per-batch
    loop; heterogeneous r-groups and the epoch-end partial fall back to
    the legacy schedule, in order."""
    r = conf.B // conf.B_seq
    K = conf.steps_per_dispatch
    prep = lambda ib: _prep_fused(trainer, conf, base_rng, ib[0], ib[1])
    stager = _stager_for(trainer, conf)
    pipeline = _FetchPipeline(depth=1)

    def log_group(preps, loss, task_losses, preds):
        tl, pr = _to_host(task_losses, preds)
        labels = {k: np.concatenate([np.asarray(p.labels[k]) for p in preps])
                  for k in preps[0].labels}
        weights = np.concatenate([p.row_weights for p in preps])
        logger.update(tl, pr, labels, weights=weights)

    def eval_item(preps, slot):
        puts = [p.payload["put"] for p in preps]
        item = {
            "p": jnp.stack([p.payload["patches"] for p in preps]),
            "m": jnp.stack([p.payload["mask"] for p in preps]),
            "lab": {k: jnp.concatenate([q["labels"][k] for q in puts])
                    for k in puts[0]["labels"]},
            "w": jnp.concatenate([q["w"] for q in puts]),
            "sk": jnp.stack([p.rng for p in preps]),
            "preps": preps,
        }
        for p in preps:
            p.payload["patches"] = p.payload["mask"] = None
        item["shape"] = item["p"].shape
        if stager is not None:
            item["hp"] = stager.stage("p", slot, item["p"])
            item["hm"] = stager.stage("m", slot, item["m"])
            item["p"] = item["m"] = None
        return item

    def consume(entry):
        items, res = entry
        # one round trip for the stacked result tree (see _fetch)
        losses, task_losses, preds = _fetch(res)
        for j, i in enumerate(items):
            log_group(i["preps"], losses[j],
                      {k: v[j] for k, v in task_losses.items()},
                      {k: v[j] for k, v in preds.items()})

    def flush_items(items):
        if not items:
            return
        shapes = {i["shape"] for i in items}
        if len(items) == K and K > 1 and len(shapes) == 1:
            if stager is not None:
                big_p, big_m = (stager.stack(items[0]["hp"]),
                                stager.stack(items[0]["hm"]))
            else:
                big_p = jnp.stack([i["p"] for i in items])
                big_m = jnp.stack([i["m"] for i in items])
            res = trainer.fused_assembled_eval_multi_step(
                big_p, big_m,
                {k: jnp.stack([i["lab"][k] for i in items])
                 for k in items[0]["lab"]},
                jnp.stack([i["w"] for i in items]),
                jnp.stack([i["sk"] for i in items]))
            pipeline.push((items, res), consume)
        else:
            pipeline.drain()  # keep metric order exact
            for i in items:
                if stager is not None and "hp" in i:
                    i["p"], i["m"] = stager.slot(i["hp"]), stager.slot(i["hm"])
                loss, task_losses, preds = trainer.fused_assembled_eval_step(
                    i["p"], i["m"], i["lab"], i["w"], i["sk"])
                log_group(i["preps"], loss, task_losses, preds)
        if stager is not None:
            stager.rotate()

    def legacy_eval(preps):
        pipeline.drain()
        assembler = BatchAssembler(conf)
        for p in preps:
            mem_patch, mem_pos, _, mem_mask = trainer.select(
                p.payload["patches"], p.payload["mask"], p.rng)
            assembler.add(mem_patch, mem_pos, mem_mask, p.labels,
                          p.row_weights)
        patch, pos, mmask, lab, weights = _put_train(trainer,
                                                     *assembler.take())
        loss, task_losses, preds = trainer.eval_step(patch, pos, mmask, lab,
                                                     weights)
        tl, pr = _to_host(task_losses, preds)
        logger.update(tl, pr, {k: np.asarray(v) for k, v in lab.items()},
                      weights=np.asarray(weights))

    depth = max(conf.prefetch_depth, r * K + 1)
    pending, group = [], []
    for p in _prefetched(enumerate(loader), prep, depth):
        group.append(p)
        if len(group) < r:
            continue
        if len({q.payload["patches"].shape for q in group}) == 1:
            pending.append(eval_item(group, len(pending)))
            if len(pending) == K:
                flush_items(pending)
                pending = []
        else:
            flush_items(pending)
            pending = []
            legacy_eval(group)
        group = []
    flush_items(pending)
    if group:
        legacy_eval(group)
    pipeline.drain()


def evaluate(trainer: IPSTrainer, loader, logger, conf: Config):
    """Evaluation epoch (reference training/iterative.py:194-231)."""
    steps_per_epoch = len(loader)
    assembler = BatchAssembler(conf)
    base_rng = jax.random.PRNGKey(conf.seed * 7_000_003 + 1)

    if (jax.process_count() > 1 and conf.eager and not conf.sparse_input
            and conf.B_seq < conf.B):
        return _epoch_assembled_mh(trainer, loader, 0, logger, conf,
                                   base_rng, train=False)
    if _use_pipeline(conf):
        return _eval_pipelined(trainer, loader, logger, conf, base_rng)
    if (conf.sparse_input and conf.eager and conf.B_seq == conf.B
            and _yields_sparse(loader)):
        return _eval_sparse_pipelined(trainer, loader, logger, conf,
                                      base_rng)
    if (conf.steps_per_dispatch > 1 and conf.eager
            and not conf.sparse_input and conf.B_seq < conf.B):
        # same gating as the train side: assembled fusion pays via K-step
        # grouping; at K=1 the legacy per-batch schedule pipelines better
        return _eval_assembled(trainer, loader, logger, conf, base_rng)

    for it, batch in enumerate(loader):
        is_last = it == steps_per_epoch - 1
        rng = jax.random.fold_in(base_rng, it)
        batch, row_weights = _pad_loader_batch(conf, batch)
        batch = _resolve_sparse(conf, trainer, batch)
        labels = _labels_from_batch(conf, batch)

        # Fused select+eval in one dispatch — reached only on the
        # sparse path now (_use_pipeline covers every dense eager case);
        # batch["input"] is the on-device densified patch tensor here.
        if conf.eager and conf.B_seq == conf.B:
            patches = batch["input"]
            patches, mask = _put_select(
                trainer, patches, _batch_mask(batch, patches.shape[0],
                                              patches.shape[1]))
            put = trainer.put_batch({"labels": labels, "w": row_weights})
            loss, task_losses, preds = trainer.fused_eval_step(
                patches, mask, put["labels"], put["w"],
                trainer.put_replicated(rng))
            if jax.process_count() > 1:
                from ips_tpu.parallel.distributed import host_allgather
                labels, row_weights = host_allgather((labels, row_weights))
            tl, pr = _to_host(task_losses, preds)
            logger.update(tl, pr, {k: np.asarray(v)
                                   for k, v in labels.items()},
                          weights=row_weights)
            continue

        if not conf.eager:
            # streaming eval reuses the buffer embeddings (the scan carry,
            # already on device): no host patch gather, no re-upload, no
            # re-encode — exact, selection ran the same eval-mode encoder
            # (steps.IPSTrainer._reuse_eval_emb)
            reuse = trainer._reuse_eval_emb()
            sel = trainer.select_streaming(
                batch["input"], batch.get("mask"), rng, return_emb=reuse)
            if reuse:
                _, mem_pos, _, mem_mask, mem_payload = sel
            else:
                mem_payload, mem_pos, _, mem_mask = sel
        else:
            reuse = False
            B_seq, N = batch["input"].shape[:2]
            patches, mask = _put_select(trainer, batch["input"],
                                        _batch_mask(batch, B_seq, N))
            mem_payload, mem_pos, _, mem_mask = trainer.select(patches, mask,
                                                               rng)
        assembler.add(mem_payload, mem_pos, mem_mask, labels, row_weights)

        if assembler.full or is_last:
            patch, pos, mmask, lab, weights = _put_train(
                trainer, *assembler.take())
            step_fn = (trainer.eval_from_emb_step if reuse
                       else trainer.eval_step)
            loss, task_losses, preds = step_fn(
                patch, pos, mmask, lab, weights)
            tl, pr = _to_host(task_losses, preds)
            logger.update(tl, pr, {k: np.asarray(v) for k, v in lab.items()},
                          weights=np.asarray(weights))
