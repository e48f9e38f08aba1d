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


def make_dataset(
    data_cfg: DataConfig, *, train: bool, seed: int = 0,
    num_epochs=None,
) -> Iterator[Batch]:
    """Build the input iterator for a config.

    `dataset == 'synthetic'` or an empty `dataset_dir` falls back to the
    deterministic synthetic stream so every config runs with nothing on
    disk; otherwise reads the sharded TFRecords produced by
    `gvcnn_tf_tpu.data.tfrecord.build_tfrecords`.
    """
    loader = data_cfg.loader
    if loader == "auto":
        if data_cfg.dataset == "synthetic" or not data_cfg.dataset_dir:
            loader = "synthetic"
        elif glob.glob(os.path.join(data_cfg.dataset_dir, "*.tfrecord")):
            loader = "tfrecord"
        else:
            loader = "native"

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
            )
        raise RuntimeError(
            "native loader unavailable (no C++ toolchain?); build TFRecords "
            "with gvcnn_tf_tpu.data.build_tfrecords instead"
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
        )
    # Single-view configs squeeze the view axis (B, 1, H, W, 3) -> (B, H, W, 3)
    # downstream in the model, so the iterator contract is uniform.
    return it
