"""Synthetic multi-view dataset — runs every config with nothing on disk.

The reference has no equivalent (it requires rendered ModelNet views on
disk); this exists so tests, benchmarks, and the driver's dryrun can stream
(B, V, H, W, 3) batches deterministically (SURVEY.md section 7 step 3).

Shapes are class-conditional so overfit/accuracy sanity tests are
meaningful: each class has a fixed random "prototype" image per view and
samples add small noise to it.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def synthetic_dataset(
    *,
    num_classes: int,
    num_views: int,
    height: int,
    width: int,
    batch_size: int,
    num_shapes: int = 128,
    seed: int = 0,
    train: bool = True,
    num_epochs: Optional[int] = None,   # None = repeat forever
    noise: float = 0.05,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[dict]:
    """Yields {'views': (B, V, H, W, 3) float32 in [-1, 1], 'label': (B,)}.

    `shard_index`/`num_shards` give each multi-host process a disjoint
    subset of the shapes (every num_shards-th index); prototypes and labels
    are derived from `seed` alone so all processes agree on the data.
    """
    rng = np.random.RandomState(seed)
    # Per-class per-view prototypes, kept low-res and upsampled to keep
    # memory small.
    proto_lr = rng.uniform(-1, 1, (num_classes, num_views, 8, 8, 3)).astype(
        np.float32
    )
    reps_h, reps_w = -(-height // 8), -(-width // 8)
    protos = np.repeat(np.repeat(proto_lr, reps_h, axis=2), reps_w, axis=3)
    protos = protos[:, :, :height, :width, :]

    labels_all = rng.randint(0, num_classes, size=num_shapes)
    shard = np.arange(num_shapes)[shard_index::num_shards]
    order_rng = np.random.RandomState(seed + 1 + shard_index)

    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = (
            shard[order_rng.permutation(len(shard))] if train else shard
        )
        n_local = len(order)
        # Train drops the ragged tail (the stream repeats anyway); eval must
        # score the FULL split — the tail batch is yielded short and the
        # eval driver pads+masks it (VERDICT r1: silent truncated eval).
        last = n_local - batch_size + 1 if train else n_local
        for start in range(0, last, batch_size):
            idx = order[start : start + batch_size]
            lbl = labels_all[idx]
            views = protos[lbl].copy()
            if train and noise > 0:
                views += noise * order_rng.randn(*views.shape).astype(np.float32)
            yield {
                "views": np.clip(views, -1.0, 1.0),
                "label": lbl.astype(np.int32),
            }
        epoch += 1
