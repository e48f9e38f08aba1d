"""Dataset dispatch: config -> iterator of host batches.

Replaces the reference's `Data` class / feed_dict plumbing (reference
data.py [U], SURVEY.md C5) with a uniform NumPy-iterator contract consumed
by the device-prefetch layer (prefetch.py).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator

import numpy as np

from gvcnn_tf_tpu.configs import DataConfig
from gvcnn_tf_tpu.data.synthetic import synthetic_dataset

Batch = Dict[str, np.ndarray]   # {'views': (B,V,H,W,3) f32, 'label': (B,) i32}


def _resolve_loader(data_cfg: DataConfig) -> str:
    loader = data_cfg.loader
    if loader == "auto":
        if data_cfg.dataset in ("procedural", "procedural_hard"):
            loader = "procedural"
        elif data_cfg.dataset == "synthetic" or not data_cfg.dataset_dir:
            loader = "synthetic"
        elif glob.glob(os.path.join(data_cfg.dataset_dir, "*.tfrecord")):
            loader = "tfrecord"
        else:
            loader = "native"
    return loader


def dataset_size(
    data_cfg: DataConfig, *, train: bool, cheap_only: bool = False
):
    """Number of shapes in the split, or None if unknown.

    Used for epoch accounting (reference trains in epochs, SURVEY.md §3.1).
    Counting TFRecords requires a full scan of the split's files, so it is
    skipped under `cheap_only` (synthetic/native counts are free).
    """
    loader = _resolve_loader(data_cfg)
    if loader in ("synthetic", "procedural"):
        return data_cfg.synthetic_num_shapes
    if loader in ("native", "decoded"):
        from gvcnn_tf_tpu.data.tfrecord import discover_shapes

        shapes, _ = discover_shapes(data_cfg.dataset_dir)
        return sum(1 for _, _, v in shapes if len(v) >= data_cfg.num_views)
    if cheap_only:
        return None
    import tensorflow as tf  # host-side record count

    split = "train" if train else "validation"
    pattern = os.path.join(data_cfg.dataset_dir, f"{split}-*.tfrecord")
    files = glob.glob(pattern)
    if not files:
        return None
    return sum(1 for _ in tf.data.TFRecordDataset(files))


def _use_device_resident(data_cfg: DataConfig, train: bool) -> bool:
    """Gate the HBM-resident split (configs.py `device_resident`).

    auto = on iff training, single-process AND single-device (the
    multi-device batch-sharding story belongs to the streaming prefetch
    layer), the uint8 wire is active (raw renders stage 4x smaller and the
    device normalizes anyway), and the split fits a conservative 4 GiB HBM
    budget (the flagship 1200-shape split is 2.17 GB on a 16 GB v5e).
    """
    mode = getattr(data_cfg, "device_resident", "auto")
    if mode == "off" or not train:
        return False
    import jax

    if mode == "on":
        if jax.process_count() > 1:
            raise ValueError(
                "device_resident='on' is single-process only (multi-host "
                "input shards through the streaming prefetch layer)")
        return True
    width = data_cfg.width or data_cfg.height
    nbytes = (data_cfg.synthetic_num_shapes * data_cfg.num_views
              * data_cfg.height * width * 3)
    return (
        data_cfg.transfer_dtype == "uint8"
        and jax.process_count() == 1
        and jax.local_device_count() == 1
        and nbytes <= (4 << 30)
    )


def make_dataset(
    data_cfg: DataConfig, *, train: bool, seed: int = 0,
    num_epochs=None, shard_index: int = 0, num_shards: int = 1,
) -> Iterator[Batch]:
    """Build the input iterator for a config.

    `dataset == 'synthetic'` or an empty `dataset_dir` falls back to the
    deterministic synthetic stream so every config runs with nothing on
    disk; otherwise reads the sharded TFRecords produced by
    `gvcnn_tf_tpu.data.tfrecord.build_tfrecords`.

    `shard_index`/`num_shards`: multi-host input sharding — each process
    streams a disjoint subset of the split at its LOCAL batch size
    (data_cfg.batch_size here is the per-process size; train() divides the
    global batch by jax.process_count() before calling).
    """
    loader = _resolve_loader(data_cfg)

    if (data_cfg.transfer_dtype == "uint8"
            and loader not in ("procedural", "native", "tfrecord",
                               "decoded")):
        raise ValueError(
            f"transfer_dtype='uint8' requires a loader that yields raw "
            f"uint8 views (procedural, native, tfrecord, decoded); got "
            f"loader={loader!r}. Use 'auto'/'bfloat16'/'float32' here.")

    if loader == "decoded":
        # Decode-once uint8 memmap cache (SURVEY.md §7 "decode-once-to-
        # arrayrecord"): first run decodes the tree, later epochs/runs
        # stream from the memmap with zero decode cost.
        from gvcnn_tf_tpu.data.decoded_cache import decoded_dataset

        return decoded_dataset(
            data_cfg.dataset_dir,
            num_views=data_cfg.num_views,
            height=data_cfg.height,
            width=data_cfg.width,
            batch_size=data_cfg.batch_size,
            train=train,
            num_epochs=num_epochs,
            seed=seed,
            shard_index=shard_index,
            num_shards=num_shards,
            raw_uint8=data_cfg.transfer_dtype == "uint8",
            # device_flip moves the random flip into the jitted train step
            # (train.py) — the host must then stream VERBATIM batches or
            # views would be double-flipped.
            augment=data_cfg.augment and not data_cfg.device_flip,
        )

    if loader == "native":
        # C++ threaded decode pool straight off a rendered-view image tree
        # (data/native/loader.cc); falls back to TFRecord/PIL paths when the
        # toolchain is unavailable.
        from gvcnn_tf_tpu.data import native_loader

        if native_loader.available():
            return native_loader.native_dataset(
                data_cfg.dataset_dir,
                num_views=data_cfg.num_views,
                height=data_cfg.height,
                width=data_cfg.width,
                batch_size=data_cfg.batch_size,
                train=train,
                num_epochs=num_epochs,
                seed=seed,
                shard_index=shard_index,
                num_shards=num_shards,
                raw_uint8=data_cfg.transfer_dtype == "uint8",
            )
        raise RuntimeError(
            "native loader unavailable (no C++ toolchain?); build TFRecords "
            "with gvcnn_tf_tpu.data.build_tfrecords instead"
        )

    if loader == "procedural":
        # Rendered views of parametric 3D meshes (data/procedural.py): the
        # in-container stand-in for ModelNet where grouping is measurable.
        if _use_device_resident(data_cfg, train):
            from gvcnn_tf_tpu.data.device_resident import (
                device_resident_iter,
            )
            from gvcnn_tf_tpu.data.procedural import build_procedural_split

            views, labels = build_procedural_split(
                num_views=data_cfg.num_views,
                height=data_cfg.height,
                width=data_cfg.width,
                num_shapes=data_cfg.synthetic_num_shapes,
                seed=seed,
                train_split=train,
                hard=data_cfg.dataset == "procedural_hard",
                num_classes=data_cfg.num_classes,
            )
            return device_resident_iter(
                views, labels,
                batch_size=data_cfg.batch_size, seed=seed, train=train,
                num_epochs=num_epochs, shard_index=shard_index,
                num_shards=num_shards,
            )
        from gvcnn_tf_tpu.data.procedural import procedural_dataset

        return procedural_dataset(
            num_classes=data_cfg.num_classes,
            num_views=data_cfg.num_views,
            height=data_cfg.height,
            width=data_cfg.width,
            batch_size=data_cfg.batch_size,
            num_shapes=data_cfg.synthetic_num_shapes,
            seed=seed,
            train=train,
            num_epochs=num_epochs,
            shard_index=shard_index,
            num_shards=num_shards,
            hard=data_cfg.dataset == "procedural_hard",
            raw_uint8=data_cfg.transfer_dtype == "uint8",
        )

    if loader == "synthetic":
        it = synthetic_dataset(
            num_classes=data_cfg.num_classes,
            num_views=data_cfg.num_views,
            height=data_cfg.height,
            width=data_cfg.width,
            batch_size=data_cfg.batch_size,
            num_shapes=data_cfg.synthetic_num_shapes,
            seed=seed,
            train=train,
            num_epochs=num_epochs,
            shard_index=shard_index,
            num_shards=num_shards,
        )
    else:
        from gvcnn_tf_tpu.data.tfrecord import tfrecord_dataset

        split = "train" if train else "validation"
        pattern = os.path.join(data_cfg.dataset_dir, f"{split}-*.tfrecord")
        if not glob.glob(pattern):
            raise FileNotFoundError(
                f"no TFRecords matching {pattern}; build them with "
                "`python -m gvcnn_tf_tpu.data.build_tfrecords`"
            )
        it = tfrecord_dataset(
            pattern,
            num_views=data_cfg.num_views,
            height=data_cfg.height,
            width=data_cfg.width,
            batch_size=data_cfg.batch_size,
            train=train,
            augment=data_cfg.augment,
            shuffle_buffer=data_cfg.shuffle_buffer,
            crop_fraction=data_cfg.crop_fraction,
            seed=seed,
            # Eval must score the FULL split: keep the ragged tail batch and
            # let the eval driver pad+mask it (the reference scores every
            # validation shape; drop_remainder would silently skip up to
            # B-1 of them).
            drop_remainder=train,
            preprocessing=data_cfg.preprocessing,
            shard_index=shard_index,
            num_shards=num_shards,
            raw_uint8=data_cfg.transfer_dtype == "uint8",
        )
    # Single-view configs squeeze the view axis (B, 1, H, W, 3) -> (B, H, W, 3)
    # downstream in the model, so the iterator contract is uniform.
    return it
