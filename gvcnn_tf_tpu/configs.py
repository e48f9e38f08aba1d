"""Typed configs for gvcnn_tf_tpu.

The reference (ace19-dev/gvcnn-tf) configures everything through flat
`tf.app.flags` globals defined at the top of each driver
(reference train.py:~L1-80 [U], SURVEY.md section 5 "Config / flag system").
We replace that with frozen dataclasses — one per BASELINE.json config — and
keep the reference flag names as CLI aliases (see `add_flags` /
`config_from_flags` at the bottom) so a user of the reference can drive our
CLIs with the same spellings (`--num_views`, `--num_group`, ...).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input-pipeline config (reference data.py [U], SURVEY.md C5/C7)."""

    dataset_dir: str = ""                # dir of TFRecords (or image tree)
    dataset: str = "modelnet40"          # modelnet10 | modelnet40 | synthetic
    num_classes: int = 40
    num_views: int = 12                  # V: 8 or 12 in the reference
    height: int = 224
    width: int = 224
    batch_size: int = 8                  # shapes per global batch
    shuffle_buffer: int = 1024
    # Train-time augmentation (reference preprocessing [MED]): random
    # horizontal flip + random crop from a slightly larger resize.
    augment: bool = True
    # DECODED loader only: apply the random per-view horizontal flip ON
    # DEVICE inside the jitted train step (a lax reverse + select fused
    # into the input processing) instead of on the host.  The host-side
    # flip is a reversed-stride copy that measured 2.5x the loader's
    # whole epoch cost at flagship shapes (9.8k -> 3.9k views/s on the
    # 1-core container); the device flip keeps epochs at memcpy speed
    # and is bandwidth-neutral under XLA fusion.  Semantics identical
    # (independent p=0.5 per (shape, view)); only the RNG stream
    # differs.  Ignored by every other loader (they augment during
    # decode, where the flip is free).
    device_flip: bool = True
    # HBM-resident train split (data/device_resident.py): stage the whole
    # uint8 split on device once and gather each batch INSIDE the jitted
    # train step — per-step H2D becomes a (B,) int32 index vector instead
    # of a 57.8 MB views batch (the train-loop wall on a remote-tunneled
    # device; measured ~0.13 s/step H2D at the tunnel's ~450 MB/s vs the
    # 75 ms compute step).  "auto" = on for the procedural loader when
    # training single-process/single-device with the uint8 wire and the
    # split fits a conservative HBM budget; "on" forces (single-process
    # only); "off" streams.  Batch order is identical to streaming.
    device_resident: str = "auto"        # auto | on | off
    crop_fraction: float = 0.875         # central-crop fraction at eval
    # Preprocessing family:
    #   square — resize to H/crop_fraction then random/central crop (round-1
    #            behavior, simple and deterministic).
    #   slim   — TF-Slim inception_preprocessing semantics: eval = central
    #            crop of `crop_fraction` THEN resize to HxW; train = slim's
    #            distorted bounding-box crop + resize + random flip.  Use
    #            this when warm-starting from slim ImageNet checkpoints so
    #            the network sees its native input distribution.
    preprocessing: str = "square"        # square | slim
    # Synthetic-data fallback so every config can run with nothing on disk.
    synthetic_num_shapes: int = 128
    prefetch_to_device: int = 2          # double-buffered HBM prefetch depth
    # Input loader: auto = synthetic if no dataset_dir, TFRecords if present,
    # else the native C++ decode pool on a rendered-view image tree.
    # | decoded (decode-once uint8 memmap cache, data/decoded_cache.py)
    loader: str = "auto"                 # auto | tfrecord | native | synthetic
    # Host->device transfer dtype for float arrays; bfloat16 halves H2D
    # bandwidth (the model casts to its compute dtype regardless).  "auto"
    # = bfloat16 iff the model computes in bfloat16 (host round-to-nearest
    # equals the on-device convert, so the step is bit-identical — measured
    # loss-exact and -0.7 ms/step on v5e, it also removes the in-step
    # fp32->bf16 convert pass over the (B,V,H,W,3) input).
    transfer_dtype: str = "auto"         # auto | float32 | bfloat16 | uint8
    # Background-thread prefetch producer: overlaps host batch prep with the
    # device step.  auto = only when the host has a spare core (on a 1-CPU
    # host the producer starves the dispatcher — measured 7x slower).
    async_prefetch: str = "auto"         # auto | on | off


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization config (reference train.py flags [U], SURVEY.md C1)."""

    optimizer: str = "momentum"          # momentum | adam | sgd
    learning_rate: float = 0.01
    momentum: float = 0.9
    lr_decay_rate: float = 0.94          # slim-style exponential decay
    lr_decay_steps: int = 2000
    warmup_steps: int = 0
    weight_decay: float = 4e-5           # slim inception_arg_scope default
    num_steps: int = 10000
    # Epoch-structured training (the reference's loop is epochs over the
    # split, SURVEY.md §3.1).  epochs > 0 overrides num_steps as
    # round(epochs * steps_per_epoch); steps_per_epoch is inferred from the
    # dataset when 0 (synthetic/native counts are free; TFRecords take one
    # scan).  Epoch progress is logged either way when the size is known.
    epochs: float = 0.0
    steps_per_epoch: int = 0
    log_every: int = 50
    checkpoint_every: int = 1000
    train_logdir: str = "/tmp/gvcnn_tpu/train"
    # Warm-start from a converted ImageNet checkpoint (reference
    # `checkpoint_path` + `checkpoint_exclude_scopes`, SURVEY.md C8).
    checkpoint_path: str = ""
    checkpoint_exclude_scopes: Tuple[str, ...] = ("Logits", "GroupingModule")
    seed: int = 0
    label_smoothing: float = 0.0
    grad_clip_norm: float = 0.0          # 0 = off
    # Gradient accumulation: split each batch into this many microbatches
    # (lax.scan, one microbatch's activations live at a time) and average
    # their grads before the optimizer step — large effective batches
    # beyond HBM. BN statistics chain per microbatch (standard semantics).
    accumulate_steps: int = 1
    # Periodic in-training evaluation over the validation split every N
    # steps (0 = off — the reference runs eval.py as a separate process;
    # this folds that loop in and logs val_accuracy to the metric stream).
    eval_every: int = 0


@dataclasses.dataclass(frozen=True)
class GVCNNConfig:
    """Full model+run config.

    Mirrors the knobs of the reference `gvcnn.py` assembly (SURVEY.md C4):
    backbone choice, number of groups M, the endpoint the scoring FCN taps,
    and the score squashing used before bucketing.
    """

    name: str = "gvcnn"
    # Model family: gvcnn (grouping head) | mvcnn (plain max-pool over views,
    # the paper's baseline — useful for ablation and as a second family).
    model: str = "gvcnn"
    backbone: str = "inception_v1"       # inception_v1 | inception_v4 | resnet50
    num_group: int = 8                   # M groups partitioning (0,1]
    # Endpoint feeding the view-discrimination FCN ("raw view descriptor",
    # reference gvcnn.py [U]: backbone stem up to an early Mixed block).
    raw_endpoint: str = "Mixed_3c"
    # Endpoint whose GAP is the final view descriptor (Mixed_5c + GAP).
    final_endpoint: str = "Mixed_5c"
    # Squash of the FCN output into (0,1): BASELINE.json north star says the
    # reference groups on *softmax* scores over the view axis; the paper uses
    # a per-view sigmoid.  Both are supported; softmax is the parity default.
    score_squash: str = "softmax"        # softmax | sigmoid | sigmoid_log
    # Group-weight variant (SURVEY.md Appendix B.4 [MED]): the reference
    # family uses mean (sum/count) of member scores; the paper describes a
    # ceiling-of-sum variant.  Both selectable so parity doesn't hinge on a
    # single [MED]-confidence reading.
    group_weight: str = "mean"           # mean | ceil_sum
    dropout_keep_prob: float = 0.8       # slim inception_v1 head default
    # BatchNorm EMA decay.  None = backbone's slim default (0.9997 for the
    # inceptions, 0.997 for resnet).  slim's 0.9997 needs thousands of steps
    # before running statistics are usable at eval — short runs should lower
    # this (e.g. 0.9) or eval sits at chance while train accuracy is high.
    bn_momentum: Optional[float] = None
    # Multi-view on/off: False = plain single-view classifier (BASELINE
    # config 1: backbone + linear head, no grouping module).
    multi_view: bool = True
    # Compute dtype for the backbone (params/BN stats stay fp32).
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas grouping kernel instead of the jnp mask-math
    # oracle.  Measured on v5e: identical train-step time at B=32 and
    # 1.5 ms SLOWER at B=1 serving (pallas_call launch overhead vs XLA's
    # own fusion of the tiny head), so the oracle is the default; the
    # kernel stays available for regimes where the (B, M, V, C) broadcast
    # is large enough to be memory-bound.
    use_pallas_grouping: bool = False
    # Rematerialize backbone activations in the backward pass
    # (jax.checkpoint): trades recompute FLOPs for HBM bandwidth/footprint.
    remat_backbone: bool = False
    # SELECTIVE remat: endpoint name through which the tower prefix is
    # rematerialized (e.g. "MaxPool_3a_3x3" recomputes the stem..pool3a
    # activations — the largest HBM tenants at batch 384 — in the backward
    # pass instead of saving them).  "" = off.  Independent of
    # remat_backbone, which checkpoints the WHOLE backbone.
    remat_until: str = ""
    # Run the 7x7/2 stem as a 4x4/1 conv on space-to-depth(2) input (exact
    # transform, identical params/checkpoints — the MLPerf ResNet TPU
    # trick; see models/backbones/inception_v1.py::SpaceToDepthStem).
    stem_space_to_depth: bool = False
    # Run the 7x7/2 stem conv as a hand-written Pallas kernel (TPU-only;
    # exact math up to bf16 reassociation, identical checkpoints).  XLA's
    # lowering of the 3-channel stride-2 stem is the model's single worst
    # op on v5e (docs/PERF_LAYERS.md); the kernel builds im2col on-chip.
    # Auto-falls back to the XLA conv off-TPU.
    stem_pallas: bool = False
    # Merge Inception Mixed-block branch convolutions into wider convs for
    # MXU lane occupancy: "none", "1x1" (the three 1x1s reading the block
    # input run as one conv), or "full" (also the two 3x3s, block-diagonal
    # kernel).  Exact math, identical checkpoints (see
    # models/backbones/inception_v1.py::InceptionBlock).  Measured on
    # v5e-1 (docs/PERF_VARIANTS.md): "1x1" is ~5% faster per train step,
    # "full"'s block-diagonal FLOPs cancel the layout gain -> default 1x1.
    merge_inception_branches: str = "1x1"

    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    # --- parallelism (build-side B1, SURVEY.md section 2) ---
    # Data-parallel degree = number of devices on the 1-D `data` mesh.
    # None = use all visible devices.
    num_devices: Optional[int] = None
    # Cross-replica BatchNorm statistics under data parallelism:
    # "global" (default) — GSPMD computes BN mean/var over the GLOBAL
    #   batch: exact single-device math at any DP degree, but every BN
    #   layer's statistics all-reduce sits in the forward critical path
    #   (~61 small collectives/step at flagship shapes — the pod-scale
    #   latency term priced by tools/analyze_collectives).
    # "local" — reference DP semantics (slim multi-tower training
    #   normalizes each tower over its own shard): the step runs under
    #   shard_map, BN normalizes over the LOCAL per-device batch, and only
    #   the running-statistics EMA update is cross-replica averaged — a
    #   combine that happens AFTER the backward pass, off the forward
    #   critical path, where XLA's all-reduce combiner can coalesce it
    #   with the gradient all-reduce (audit: tools/analyze_collectives
    #   --bn_sync local).  Identical math at num_devices=1.
    bn_sync: str = "global"              # global | local

    def replace(self, **kw) -> "GVCNNConfig":
        return dataclasses.replace(self, **kw)


def resolve_transfer_dtype(config: "GVCNNConfig"):
    """DataConfig.transfer_dtype -> dtype string for the prefetch layer,
    or None for no host-side cast.  "auto" transfers bfloat16 exactly when
    the model computes in bfloat16 (bit-identical to the on-device convert,
    half the H2D bytes); anything computing in float32 keeps full precision
    on the wire.  "uint8" ships the RAW image bytes (supported loaders
    yield uint8 views; normalization runs on device, utils/images.py —
    ~1-ulp equivalent, 4x less H2D than float32, zero host-side
    conversion)."""
    td = config.data.transfer_dtype
    if td == "auto":
        td = ("bfloat16" if config.compute_dtype == "bfloat16"
              else "float32")
    return None if td in ("float32", "uint8") else td


def _cfg(**kw) -> GVCNNConfig:
    data_kw = kw.pop("data", {})
    train_kw = kw.pop("train", {})
    return GVCNNConfig(
        data=DataConfig(**data_kw), train=TrainConfig(**train_kw), **kw
    )


# The five BASELINE.json configs (BASELINE.json:6-12), by name.
CONFIGS = {
    # 1. Inception-v1 single-view ModelNet10 classification, batch 8,
    #    224x224 (CPU-runnable).
    "mn10_single_view": _cfg(
        name="mn10_single_view",
        multi_view=False,
        compute_dtype="float32",
        data=dict(dataset="modelnet10", num_classes=10, num_views=1,
                  batch_size=8),
    ),
    # 2. GVCNN 8-view ModelNet10 with grouping module + intra-group pooling.
    "mn10_8view": _cfg(
        name="mn10_8view",
        data=dict(dataset="modelnet10", num_classes=10, num_views=8,
                  batch_size=8),
    ),
    # 3. GVCNN 12-view ModelNet40, Inception-v1 backbone (full reference
    #    config) — the flagship.
    "mn40_12view": _cfg(
        name="mn40_12view",
        data=dict(dataset="modelnet40", num_classes=40, num_views=12,
                  batch_size=8),
    ),
    # 4. GVCNN 12-view ModelNet40 with swapped backbone.
    "mn40_12view_inception_v4": _cfg(
        name="mn40_12view_inception_v4",
        backbone="inception_v4",
        raw_endpoint="Mixed_5e",
        final_endpoint="Mixed_7d",
        data=dict(dataset="modelnet40", num_classes=40, num_views=12,
                  batch_size=8),
    ),
    "mn40_12view_resnet50": _cfg(
        name="mn40_12view_resnet50",
        backbone="resnet50",
        raw_endpoint="block2",
        final_endpoint="block4",
        data=dict(dataset="modelnet40", num_classes=40, num_views=12,
                  batch_size=8),
    ),
    # MVCNN baseline (Su et al. 2015): shared backbone + element-wise max
    # over all view descriptors, no grouping module.
    "mn40_12view_mvcnn": _cfg(
        name="mn40_12view_mvcnn",
        model="mvcnn",
        data=dict(dataset="modelnet40", num_classes=40, num_views=12,
                  batch_size=8),
    ),
    # 5. Data-parallel 12-view ModelNet40 training on v5e-8, sharded input
    #    over ICI.  Same model as 3; global batch scaled to the mesh.
    "mn40_12view_dp8": _cfg(
        name="mn40_12view_dp8",
        num_devices=8,
        data=dict(dataset="modelnet40", num_classes=40, num_views=12,
                  batch_size=64),
    ),
}


def get_config(name: str) -> GVCNNConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; have {sorted(CONFIGS)}")
    return CONFIGS[name]


# ---------------------------------------------------------------------------
# Reference-compatible CLI flags (tf.app.flags parity).
# ---------------------------------------------------------------------------

def add_flags(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Register the reference's flag names (reference train.py:~L1-80 [U])."""
    p.add_argument("--config", default="mn40_12view",
                   help=f"named config, one of {sorted(CONFIGS)}")
    p.add_argument("--num_views", type=int, default=None)
    p.add_argument("--num_group", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--optimizer", default=None)
    p.add_argument("--how_many_training_steps", "--num_steps", dest="num_steps",
                   type=int, default=None)
    p.add_argument("--num_epochs", "--epochs", dest="epochs", type=float,
                   default=None,
                   help="train for N epochs over the split (overrides steps)")
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--accumulate_steps", type=int, default=None,
                   help="gradient-accumulation microbatches per step")
    p.add_argument("--eval_every", type=int, default=None,
                   help="run validation-split eval every N steps "
                        "(0 = off; single-process runs only)")
    p.add_argument("--train_logdir", default=None)
    p.add_argument("--dataset_dir", default=None)
    p.add_argument("--dataset", default=None)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--checkpoint_exclude_scopes", default=None,
                   help="comma-separated scope prefixes to skip on warm-start")
    p.add_argument("--backbone", default=None)
    p.add_argument("--model", default=None, help="gvcnn | mvcnn")
    p.add_argument("--bn_momentum", type=float, default=None,
                   help="BN EMA decay; lower (e.g. 0.9) for short runs")
    p.add_argument("--group_weight", default=None,
                   help="group weight variant: mean | ceil_sum")
    p.add_argument("--preprocessing", default=None,
                   help="preprocessing family: square | slim")
    p.add_argument("--loader", default=None,
                   choices=["auto", "tfrecord", "native", "synthetic",
                            "procedural", "decoded"],
                   help="input loader ('decoded' = decode-once uint8 "
                        "memmap cache over an image tree)")
    p.add_argument("--transfer_dtype", default=None,
                   choices=["auto", "float32", "bfloat16", "uint8"],
                   help="host->device wire dtype for views (uint8 ships "
                        "raw renders and normalizes on device — ~1-ulp "
                        "equivalent, 4x less H2D; procedural/native/"
                        "tfrecord/decoded loaders)")
    p.add_argument("--device_resident", default=None,
                   choices=["auto", "on", "off"],
                   help="stage the whole uint8 train split in HBM once and "
                        "gather batches inside the jitted step (procedural "
                        "loader; per-step H2D = a B-long index vector)")
    p.add_argument("--score_squash", default=None,
                   help="score squash: softmax | sigmoid | sigmoid_log")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--stem_space_to_depth", action="store_true",
                   default=None,
                   help="run the 7x7/2 stem on space-to-depth input "
                        "(exact; TPU layout optimization)")
    p.add_argument("--stem_pallas", action="store_true", default=None,
                   help="run the 7x7/2 stem as a Pallas TPU kernel "
                        "(exact up to bf16 reassociation)")
    p.add_argument("--merge_inception_branches", default=None,
                   help="merge Mixed-block branch convs into wider convs "
                        "(exact; TPU MXU-occupancy optimization): "
                        "'none' | '1x1' | 'full', optionally with "
                        "per-block overrides, e.g. "
                        "'1x1,Mixed_3b=full,Mixed_3c=full'")
    p.add_argument("--remat_until", default=None,
                   help="selectively rematerialize the backbone prefix "
                        "through this endpoint (e.g. MaxPool_3a_3x3) in "
                        "the backward pass; '' = off")
    p.add_argument("--bn_sync", default=None, choices=["global", "local"],
                   help="BN statistics under data parallelism: 'global' "
                        "(exact global-batch stats, default) or 'local' "
                        "(per-device stats a la slim towers; EMA update "
                        "cross-replica averaged off the critical path)")
    return p


def config_from_flags(args: argparse.Namespace) -> GVCNNConfig:
    cfg = get_config(args.config)
    data_kw, train_kw, top_kw = {}, {}, {}
    for field, dst in [
        ("num_views", data_kw), ("num_classes", data_kw), ("height", data_kw),
        ("width", data_kw), ("batch_size", data_kw), ("dataset_dir", data_kw),
        ("dataset", data_kw), ("preprocessing", data_kw),
        ("transfer_dtype", data_kw), ("loader", data_kw),
        ("device_resident", data_kw),
        ("learning_rate", train_kw), ("optimizer", train_kw),
        ("num_steps", train_kw), ("train_logdir", train_kw),
        ("epochs", train_kw), ("steps_per_epoch", train_kw),
        ("accumulate_steps", train_kw), ("eval_every", train_kw),
        ("checkpoint_path", train_kw), ("seed", train_kw),
        ("num_group", top_kw), ("backbone", top_kw), ("model", top_kw),
        ("bn_momentum", top_kw), ("group_weight", top_kw),
        ("score_squash", top_kw), ("stem_space_to_depth", top_kw),
        ("stem_pallas", top_kw), ("merge_inception_branches", top_kw),
        ("remat_until", top_kw), ("bn_sync", top_kw),
    ]:
        v = getattr(args, field, None)
        if v is not None:
            dst[field] = v
    if getattr(args, "checkpoint_exclude_scopes", None) is not None:
        train_kw["checkpoint_exclude_scopes"] = tuple(
            s for s in args.checkpoint_exclude_scopes.split(",") if s
        )
    if data_kw:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_kw))
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    if top_kw:
        cfg = cfg.replace(**top_kw)
    return cfg
