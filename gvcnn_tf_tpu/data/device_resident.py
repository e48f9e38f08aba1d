"""HBM-resident train split: stage once, gather each batch on device.

TPU-native answer to the per-step input transfer the reference pays on
every `sess.run` (feed_dict host->device copy, SURVEY.md §3.1 "host->device
boundary").  On a remote-tunneled or host-bound device the train-loop wall
is NOT compute: at the flagship operating point a uint8 batch is
32 x 12 x 224² x 3 = 57.8 MB, and the streaming path pays a host fancy-index
gather + an H2D copy (measured ~0.13 s at the tunnel's ~450 MB/s) + a
dispatch round trip EVERY step, against a 75 ms device step.  The full
1200-shape flagship split is 2.17 GB uint8 — 13% of one v5e chip's HBM —
so it rides H2D exactly once (~5 s) and every batch becomes a `jnp.take`
INSIDE the jitted train step: per-step H2D collapses to a (B,)-int32 index
vector (128 B), and the step stays ONE dispatch.

Batch-order semantics are IDENTICAL to the streaming
`procedural_dataset`/`synthetic_dataset` (per-epoch permutation drawn from
`RandomState(seed + 7 + shard_index)`, train drops the ragged tail), so a
device-resident run is batch-for-batch comparable with a streaming run —
and since the device normalization (utils/images.py) is shared, the step
math is bit-identical (tests/test_device_resident.py).

The iterator yields `{"views": <full split, device-committed uint8>,
"label": <full labels, device int32>, "idx": <(B,) int32 host vector>}`;
`train_step` detects the "idx" key and gathers on device (train.py).
Single-process / single-device only — the multi-device batch-sharding
story belongs to the streaming prefetch layer, and `pipeline.make_dataset`
auto-gates accordingly (configs.py `device_resident`).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

# Chunk size for the one-time staging transfer: a single multi-GB
# device_put is one transport message on remote platforms (tunnel RPC) and
# can exceed message limits; ~256 MB chunks stream safely and concatenate
# on device (transient 2x HBM during the concat, freed immediately).
_STAGE_CHUNK_BYTES = 256 << 20


def stage_on_device(arr: np.ndarray):
    """device_put `arr` (chunked along axis 0 if large) -> device array."""
    import jax
    import jax.numpy as jnp

    if arr.nbytes <= _STAGE_CHUNK_BYTES:
        out = jax.device_put(arr)
    else:
        n = int(arr.nbytes // _STAGE_CHUNK_BYTES) + 1
        parts = [jax.device_put(p) for p in np.array_split(arr, n, axis=0)]
        out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    return out


def device_resident_iter(
    views: np.ndarray,
    labels: np.ndarray,
    *,
    batch_size: int,
    seed: int = 0,
    train: bool = True,
    num_epochs: Optional[int] = None,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[dict]:
    """Yield full-split device handles + per-step host index vectors.

    Same tail semantics as the streaming iterators: train drops the ragged
    tail batch, eval yields it short.
    """
    import jax

    dv = stage_on_device(np.ascontiguousarray(views))
    dl = jax.device_put(np.asarray(labels, np.int32))
    shard = np.arange(len(labels))[shard_index::num_shards]
    order_rng = np.random.RandomState(seed + 7 + shard_index)
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = (
            shard[order_rng.permutation(len(shard))] if train else shard
        )
        n_local = len(order)
        last = n_local - batch_size + 1 if train else n_local
        for start in range(0, last, batch_size):
            yield {
                "views": dv,
                "label": dl,
                "idx": np.asarray(
                    order[start:start + batch_size], np.int32),
            }
        epoch += 1
