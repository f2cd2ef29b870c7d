"""Typed configuration system.

Drop-in compatible with the reference YAML schema (sections opt/dset/misc/
enc/ips/aggr/tasks, see reference config/mnist_config.yml:1-72), replacing
the reference's untyped attribute bag (`Struct`, reference utils/utils.py:10-12)
with a validated dataclass plus CLI-style `key=value` overrides.

New (TPU-native) knobs beyond the reference schema are grouped at the bottom
of :class:`Config` and all have defaults, so the three shipped reference
YAMLs load unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclasses.dataclass
class TaskConfig:
    """One prediction task (reference config/mnist_config.yml:51-71)."""

    id: int
    name: str
    act_fn: str  # 'softmax' | 'sigmoid'
    metric: str  # 'accuracy' | 'multilabel_accuracy' | 'auc'

    def __post_init__(self):
        if self.act_fn not in ("softmax", "sigmoid"):
            raise ValueError(f"task {self.name}: unknown act_fn {self.act_fn!r}")
        if self.metric not in ("accuracy", "multilabel_accuracy", "auc"):
            raise ValueError(f"task {self.name}: unknown metric {self.metric!r}")


def _as_tuple2(v) -> Optional[Tuple[int, int]]:
    if v is None:
        return None
    return (int(v[0]), int(v[1]))


@dataclasses.dataclass
class Config:
    # --- opt (reference config/*_config.yml "#opt") ---
    n_epoch: int = 1
    B: int = 16            # optimizer batch size
    B_seq: int = 16        # loader batch size (B for eager/lazy, 1 for sequential)
    n_epoch_warmup: float = 10
    lr: float = 1e-3
    wd: float = 0.1

    # --- dset ---
    n_class: int = 10
    data_dir: str = ""
    train_fname: str = ""   # camelyon only
    test_fname: str = ""    # camelyon only
    n_worker: int = 0
    pin_memory: bool = True    # accepted for YAML compat; no-op on TPU
    eager: bool = True         # eager: whole patch tensor to HBM; lazy: stream chunks

    # --- misc ---
    eps: float = 1e-6
    seed: int = 0
    track_efficiency: bool = False
    track_epoch: int = 0

    # --- enc ---
    is_image: bool = True
    enc_type: str = "resnet18"      # 'resnet18' | 'resnet50'
    pretrained: bool = False
    n_chan_in: int = 1
    n_res_blocks: int = 2           # 2 or 4 truncation of the ResNet

    # --- ips ---
    shuffle: bool = True
    shuffle_style: str = "batch"    # 'batch' | 'instance'
    n_token: int = 1
    N: int = 0                      # total patches per image (0 => variable-N dataset)
    M: int = 100                    # memory (top-M buffer) size
    I: int = 100                    # iteration (chunk) size
    patch_size: Optional[Tuple[int, int]] = None
    patch_stride: Optional[Tuple[int, int]] = None

    # --- aggr ---
    use_pos: bool = False
    H: int = 8
    D: int = 128
    D_k: int = 16
    D_v: int = 16
    D_inner: int = 512
    attn_dropout: float = 0.1
    dropout: float = 0.1

    # --- tasks ---
    tasks: Dict[str, TaskConfig] = dataclasses.field(default_factory=dict)

    # ===== TPU-native extensions (not in reference schema; all defaulted) =====
    compute_dtype: str = "float32"     # 'float32' | 'bfloat16' encoder/attn compute
    input_dtype: str = "float32"       # patch storage dtype on device;
                                       # 'bfloat16' halves selection-loop HBM
                                       # traffic (measured ~18% faster select)
    s2d_stem: bool = False             # space-to-depth stem conv: exact same
                                       # numerics/params, better MXU use
    sparse_input: bool = False         # loader ships sparse (idx, val) pairs;
                                       # patches are densified ON DEVICE —
                                       # O(nnz) host->HBM traffic instead of
                                       # O(H*W) (sparse datasets, exact tiling)
    select_dtype: str = "default"      # 'default' | 'int8': quantize the
                                       # NO-GRAD selection encoder to int8
                                       # (v5e int8 MXU ~2x bf16); training
                                       # forward stays full precision.
                                       # MEASURED (RESULTS.md round 3, the
                                       # epoch-44 MNIST checkpoint): END-TO-
                                       # END SLOWER on v5e, and trained-
                                       # params selection-set Jaccard vs
                                       # bf16 is only 0.16 (end metrics
                                       # happened to be unchanged on MNIST,
                                       # delta <= 0.002, but the ranking
                                       # itself diverges). Keep 'default'
                                       # unless you re-measure both on your
                                       # own task
    preencode_select: Any = "auto"     # encode all N patches in ONE batched
                                       # dispatch and scan over cached
                                       # embedding rows (eager path only;
                                       # identical selection, costs a
                                       # (B, N, D) table in HBM).
                                       # 'auto' (default) enables it when
                                       # the resident patch table exceeds
                                       # VMEM (~128 MB): beyond that the
                                       # per-chunk patch-row gathers run at
                                       # ~10 GB/s effective (the round-2
                                       # large-N cliff; measured -39% at
                                       # N=3600, results/largeN_probe.json)
    steps_per_dispatch: int = 1        # optimizer steps per device dispatch
                                       # (lax.scan over stacked batches).
                                       # Amortizes per-dispatch overhead
                                       # (~5 ms/step on remote-attached
                                       # TPUs); identical update sequence;
                                       # eager fused, sparse fused, and
                                       # assembled (B_seq < B) paths.
                                       # HBM COST: inputs scale with K —
                                       # the (K, B, N, ...) stacked group,
                                       # plus up to K+1 prefetched batches
                                       # in flight, i.e. peak input HBM
                                       # ~= 2-3x K single batches. At the
                                       # mnist bench shape (B=16, N=900,
                                       # bf16) one batch is ~69 MB, so
                                       # K=32 holds ~4-6 GB; halve K if a
                                       # dense-image config OOMs.
                                       # PICKING K: measured-best is
                                       # workload- AND host-dependent
                                       # (mnist bench: K=32; camelyon
                                       # feature: K=4 won the round-5
                                       # uncontended A/B/A/B, K=8 won one
                                       # CPU-contended session —
                                       # results/k_ab_r5*.json). Decision
                                       # rule: run scripts/probe_k_ab.py
                                       # on YOUR host (it records a
                                       # tunnel-bandwidth control row) and
                                       # ship the K that wins the DRIVER
                                       # column in both repetitions; on
                                       # ties prefer smaller K (smaller
                                       # staging quanta, lower HBM)
    stream_chunk_group: int = 4        # streaming (lazy) selection: chunks
                                       # per device dispatch. The host
                                       # stacks G consecutive I-chunks into
                                       # one (G, B, I, ...) stage and the
                                       # device lax.scans the selection
                                       # step over them — one dispatch +
                                       # one device_put per G chunks
                                       # instead of per chunk. Params are
                                       # constant within a selection, so
                                       # unlike steps_per_dispatch on the
                                       # train path this is staleness-free
                                       # and exact (identical update
                                       # sequence); leftover chunks
                                       # (len % G) run the per-chunk
                                       # engine. HBM cost: one staged
                                       # group holds G chunks instead of
                                       # 1-2. Ignored when eager=true.
                                       # Default 4 = measured best
                                       # host-fed: 1.60x per selection at
                                       # the large-N image shape (B=4,
                                       # N=4352, I=256 uint8 tiles);
                                       # G=8/16 pipeline transfers more
                                       # coarsely and win less. With
                                       # device-resident inputs grouping
                                       # is neutral (async dispatch
                                       # already hides issue cost) —
                                       # results/stream_group_probe.json
    ln_fold: bool = False              # feature-projector LayerNorm->GEMM
                                       # fold: the LN row-affine commutes
                                       # through the linear layer, so the
                                       # GEMM reads raw bf16 rows and the
                                       # normalization is applied to the
                                       # (.., D) output (fp32 accumulation;
                                       # see models/encoders.py). Removes
                                       # the fp32 upcast of the whole
                                       # (B, N, n_chan_in) table from the
                                       # selection encode. Numerics differ
                                       # from the exact path only at bf16
                                       # rounding scale; feature mode only
    eval_reuse_emb: bool = True        # eval/inference forward reuses the
                                       # selection buffer's raw embeddings
                                       # instead of re-encoding the M
                                       # selected patches: selection already
                                       # ran the encoder in the SAME eval
                                       # mode (frozen BN, no dropout), so
                                       # the re-encode the reference does
                                       # (architecture/ips_net.py:264-283)
                                       # recomputes identical values. Skips
                                       # the (B, M, ...) patch gather AND
                                       # the whole eval encoder pass (~1/3
                                       # of eval FLOPs at camelyon scale).
                                       # Train steps always re-encode (the
                                       # gradient forward runs train-mode
                                       # BN/dropout). Auto-disabled for
                                       # select_dtype=int8, whose buffer
                                       # embeddings are quantized
    remat_encode: bool = False         # rematerialize the gradient-mode
                                       # encoder (jax.checkpoint): the
                                       # backward recomputes the encoder
                                       # forward instead of keeping every
                                       # intermediate conv activation
                                       # resident across the aggregation
                                       # transformer and its backward.
                                       # EXACT — bit-identical losses,
                                       # grads and updates (regression-
                                       # tested); costs one extra encoder
                                       # forward per train step
    grad_encode_chunk: int = 0         # chunk the gradient re-encode of
                                       # the M selected patches: the train
                                       # forward lax.scans the encoder over
                                       # (B, chunk, ...) slices with
                                       # rematerialized bodies, bounding
                                       # train-side activation memory at
                                       # ONE chunk — the gradient-side
                                       # analog of the selection engine's
                                       # chunked pre-encode, for image mode
                                       # at large M (the reference
                                       # re-encodes all M at once,
                                       # ips_net.py:264-283, which is the
                                       # HBM binder there). 0 disables;
                                       # values >= M behave like
                                       # remat_encode. NOTE: train-mode
                                       # BatchNorm then computes batch
                                       # statistics per chunk (ghost batch
                                       # norm: B*chunk rows instead of
                                       # B*M; running averages update per
                                       # chunk in order) — NOT bit-identical
                                       # to the whole-batch forward; eval
                                       # is untouched. Scan+remat equals a
                                       # per-chunk python loop exactly
                                       # (oracle-tested)
    select_unroll: int = 1             # lax.scan unroll factor for the
                                       # selection loop (semantics-identical;
                                       # lets XLA overlap scoring/top-k with
                                       # the next chunk's convs)
    score_impl: str = "fast"           # 'attn' (reference-shaped), 'fast'
                                       # (query-folded single GEMM), 'pallas'
                                       # (fused kernel); all numerically equal.
                                       # 'pallas' is FROZEN experimental: XLA
                                       # parity fp32 / +3% bf16 at camelyon
                                       # scale and the scorer is <5% of a
                                       # step (RESULTS.md scorer verdict)
    use_pallas: bool = False           # back-compat alias for score_impl='pallas'
    mesh_data: int = 1                 # data-parallel mesh axis size
    mesh_patch: int = 1                # context/patch-parallel mesh axis size
    cp_select: str = "exact"           # context-parallel selection mode:
                                       # 'exact' (default) runs the SINGLE
                                       # global selection stream with each
                                       # chunk's encode sharded over the
                                       # patch axis and only (B, n, D)
                                       # embeddings re-replicated for
                                       # scoring — numerics identical to
                                       # single-device on every eager path
                                       # (the streaming path was already
                                       # exact this way). 'local_merge' is
                                       # the legacy approximation: per-shard
                                       # local top-M + one global rescoring
                                       # merge (zero cross-device traffic
                                       # during the scan, Jaccard 0.97-0.99
                                       # vs exact; fidelity-guarded in
                                       # tests/test_cp_fidelity.py) — keep
                                       # for bandwidth-starved meshes
    donate_buffers: bool = True        # donate train-state in jitted steps
    checkpoint_dir: str = ""           # orbax checkpoint dir ('' disables)
    checkpoint_every: int = 0          # epochs between checkpoints (0 disables)
    resume: bool = False               # resume from latest checkpoint
    bucket_sizes: Optional[List[int]] = None  # padding buckets for variable-N data
    mask_padding: bool = False         # mask padded patches in the final aggregation
                                       # (reference zero-fills without masking,
                                       #  reference training/iterative.py:7-29)
    log_every: int = 0                 # steps between stdout loss logs (0 disables)
    pretrained_path: str = ""          # local .npz with converted pretrained weights
    profile_dir: str = ""              # write a jax.profiler trace of epoch 0
                                       # here (TensorBoard/Perfetto); '' disables
    metrics_path: str = ""             # append per-epoch metrics as JSON lines
                                       # (observability; reference is stdout-only)
    input_norm: str = "none"           # 'imagenet': normalize inputs ON DEVICE
                                       # (RGB datasets then ship compact uint8
                                       # patches — 4x less host->HBM traffic
                                       # than host-side float normalization;
                                       # reference normalizes on host,
                                       # traffic_dataset.py:275-290)
    img_size: Optional[List[int]] = None  # dataset resize (H, W) override for
                                       # the traffic pipeline (None = the
                                       # reference's fixed 1200x1600)
    max_shift: Optional[int] = None    # traffic train-time translate bound in
                                       # px (reference RandomAffine shifts up
                                       # to 100 px, traffic_dataset.py:282).
                                       # None = scale 100 px with any img_size
                                       # override; set explicitly to match the
                                       # reference's FIXED 100 px at a reduced
                                       # img_size (the reference's translate
                                       # fraction 100/IMG_SIZE keeps 100 px at
                                       # any resolution)
    multihost: bool = False            # initialize jax.distributed before
                                       # training: the CLI becomes one
                                       # process of a multi-host run. On TPU
                                       # pods coordinator/process ids are
                                       # auto-detected from the environment;
                                       # the knobs below are only for manual
                                       # (e.g. CPU fleet) setups. Replaces
                                       # the reference's single-GPU pin
                                       # (reference main.py:19-20)
    coordinator_address: str = ""      # host:port of process 0 ('' = auto)
    num_processes: int = 0             # total processes (0 = auto)
    process_id: int = -1               # this process's id (-1 = auto)
    cpu_collectives: str = ""          # 'gloo' | 'mpi': cross-process
                                       # collectives on the CPU backend
                                       # (multi-process CPU fleets / tests)
    prefetch_depth: int = 2            # loader batches kept in flight ON
                                       # DEVICE in the eager fused paths:
                                       # batch k+1's host->HBM transfer
                                       # overlaps batch k's step (the
                                       # reference serializes them,
                                       # training/iterative.py:118-121).
                                       # 1 disables; numerics identical

    def __post_init__(self):
        self.patch_size = _as_tuple2(self.patch_size)
        self.patch_stride = _as_tuple2(self.patch_stride)
        if self.enc_type not in ("resnet18", "resnet50"):
            raise ValueError(f"unknown enc_type {self.enc_type!r}")
        if self.n_res_blocks not in (2, 4):
            raise ValueError("n_res_blocks must be 2 or 4")
        if self.shuffle_style not in ("batch", "instance"):
            raise ValueError(f"unknown shuffle_style {self.shuffle_style!r}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype {self.compute_dtype!r}")
        if self.input_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown input_dtype {self.input_dtype!r}")
        if self.sparse_input and not self.eager:
            raise ValueError("sparse_input implies eager (on-device) patches")
        if self.use_pallas:
            self.score_impl = "pallas"
        if self.score_impl not in ("attn", "fast", "pallas"):
            raise ValueError(f"unknown score_impl {self.score_impl!r}")
        if self.input_norm not in ("none", "imagenet"):
            raise ValueError(f"unknown input_norm {self.input_norm!r}")
        if self.input_norm == "imagenet" and (not self.is_image
                                              or self.n_chan_in != 3):
            raise ValueError("input_norm='imagenet' needs RGB image input")
        if self.prefetch_depth < 1:
            raise ValueError("prefetch_depth must be >= 1")
        if self.select_unroll < 1:
            raise ValueError("select_unroll must be >= 1")
        if self.cp_select not in ("exact", "local_merge"):
            raise ValueError(
                f"cp_select must be 'exact' or 'local_merge', got "
                f"{self.cp_select!r}")
        if (self.select_unroll > 1 and self.mesh_patch > 1
                and self.cp_select == "local_merge"):
            raise ValueError(
                "select_unroll > 1 is not supported with "
                "cp_select='local_merge': that path runs per-shard scans "
                "and would silently ignore the knob")
        if self.select_unroll > 1 and not self.eager:
            raise ValueError(
                "select_unroll > 1 needs eager=true: streaming (lazy) "
                "selection is host-chunked and would silently ignore the "
                "knob")
        if self.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if self.grad_encode_chunk < 0:
            raise ValueError("grad_encode_chunk must be >= 0 (0 disables)")
        if self.stream_chunk_group < 1:
            raise ValueError("stream_chunk_group must be >= 1")
        if self.use_pos and self.N <= 0:
            raise ValueError(
                "use_pos needs a fixed patch count (N > 0): the positional "
                "table is built per original patch index (reference "
                "ips_net.py:110-113); variable-N datasets (N=0) must set "
                "use_pos: false")
        if self.preencode_select not in (True, False, "auto"):
            raise ValueError(
                f"preencode_select must be true/false/'auto', got "
                f"{self.preencode_select!r}")
        if (self.preencode_select is True and self.mesh_patch > 1
                and self.cp_select == "local_merge"):
            raise ValueError(
                "preencode_select=true is not supported with "
                "cp_select='local_merge': that path streams per-shard "
                "chunks and would silently ignore the knob (leave it "
                "'auto', which stays off there; cp_select='exact' "
                "supports pre-encoding)")
        if self.img_size is not None:
            self.img_size = _as_tuple2(self.img_size)
        if self.max_shift is not None and self.max_shift < 0:
            raise ValueError("max_shift must be >= 0")
        if self.cpu_collectives not in ("", "gloo", "mpi"):
            raise ValueError(
                f"unknown cpu_collectives {self.cpu_collectives!r}")
        if self.select_dtype not in ("default", "int8"):
            raise ValueError(f"unknown select_dtype {self.select_dtype!r}")
        if self.select_dtype == "int8" and not self.is_image:
            raise ValueError(
                "select_dtype=int8 quantizes the conv encoder; feature "
                "mode (is_image=false) uses the projector — leave default")
        if self.M <= 0 or self.I <= 0:
            raise ValueError("M and I must be positive")
        if self.B % self.B_seq != 0:
            # Same contract as the reference: B_seq is either B (eager/lazy)
            # or 1 (eager sequential) — see reference config/*.yml "#opt".
            raise ValueError("B must be a multiple of B_seq")
        if self.D % 2 != 0 and self.use_pos:
            raise ValueError("use_pos requires even D (sin/cos interleave)")
        if isinstance(self.tasks, dict):
            fixed = {}
            for k, v in self.tasks.items():
                fixed[k] = v if isinstance(v, TaskConfig) else TaskConfig(**v)
            self.tasks = fixed
        if not self.tasks:
            raise ValueError("config must define at least one task")
        n_tok_needed = len(self.tasks)
        if self.n_token < n_tok_needed:
            raise ValueError(
                f"n_token={self.n_token} < number of tasks ({n_tok_needed})")

    # -- convenience --------------------------------------------------------
    @property
    def task_list(self) -> List[TaskConfig]:
        return sorted(self.tasks.values(), key=lambda t: t.id)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return d

    def pretty(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)}


def config_from_dict(d: Dict[str, Any]) -> Config:
    unknown = set(d) - _FIELD_NAMES
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return Config(**d)


def _parse_override(val: str) -> Any:
    """Parse a CLI override value with YAML scalar rules."""
    return yaml.safe_load(val)


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    """Load a YAML config (reference schema) with optional key=value overrides."""
    with open(path, "r") as f:
        d = yaml.safe_load(f)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        d[k.strip()] = _parse_override(v)
    return config_from_dict(d)
