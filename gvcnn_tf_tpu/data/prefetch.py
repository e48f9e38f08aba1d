"""Device-side double-buffered prefetch (SURVEY.md B4).

The reference pays a host->device copy inside every `sess.run` feed_dict
(SURVEY.md section 3.1 "host->device boundary").  Here batches are pushed to
HBM ahead of compute: a small ring of already-device_put batches is kept
full while the train step runs, and sharded batches land directly on the
`data` mesh axis via `jax.device_put` with a NamedSharding (so each chip
only materializes its shard slice).
"""

from __future__ import annotations

import collections
from typing import Iterator, Optional

import jax


def _make_put(sharding, transfer_dtype):
    """Shared host->device transfer fn for both prefetch variants.

    Single-process: a sharded device_put (the put IS the scatter over the
    mesh).  Multi-process: each host holds only its local shard, so the
    global array is assembled with make_array_from_process_local_data —
    device_put of a whole global batch would require non-addressable
    devices (the round-1 multihost gap: make_global_batch was never wired
    into the train path).
    """
    cast_to = None
    if transfer_dtype is not None:
        import numpy as _np

        import ml_dtypes  # numpy bf16 support, bundled with jax

        cast_to = {"bfloat16": ml_dtypes.bfloat16}.get(
            str(transfer_dtype), transfer_dtype
        )
        if _np.dtype(cast_to).kind in "iub":
            # Integer wire formats (raw uint8 images) are produced by the
            # LOADER; a float->int cast here would destroy normalized data.
            # (Float targets include ml_dtypes.bfloat16, whose numpy kind
            # is the custom 'V', so only int/bool kinds are rejected.)
            raise ValueError(
                f"prefetch transfer_dtype must be a float dtype, got "
                f"{transfer_dtype!r} (uint8 transfers are configured at "
                f"the dataset layer, see configs.resolve_transfer_dtype)")
    multiproc = jax.process_count() > 1 and sharding is not None

    def put(x):
        if cast_to is not None and hasattr(x, "dtype") and x.dtype.kind == "f":
            x = x.astype(cast_to)
        if multiproc:
            import numpy as np

            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding) if sharding is not None else (
            jax.device_put(x)
        )

    return put


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    transfer_dtype=None,
) -> Iterator:
    """Wrap a host-batch iterator with an N-deep on-device buffer.

    `sharding` (typically NamedSharding(mesh, P('data', ...))) makes the
    device_put itself the scatter over the mesh — no per-chip Python loop.
    `transfer_dtype='bfloat16'` casts float arrays host-side before the
    copy, halving H2D bandwidth (231 MB -> 115 MB per flagship batch); the
    model casts to its compute dtype anyway.
    """
    queue = collections.deque()
    put = _make_put(sharding, transfer_dtype)

    def enqueue(n):
        for _ in range(n):
            batch = next(iterator, None)
            if batch is None:
                return
            queue.append(jax.tree.map(put, batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


def prefetch_to_device_async(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    transfer_dtype=None,
) -> Iterator:
    """Like prefetch_to_device, but a background thread produces batches.

    The synchronous version enqueues the next batch only when the consumer
    asks, so host-side batch generation/decoding serializes with the train
    step; with a producer thread the host prepares batch N+2 while the
    device runs step N (this is what makes input-bound configs overlap —
    measured 2.4x on the synthetic full-res demo).
    """
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=size)
    stop = threading.Event()
    put = _make_put(sharding, transfer_dtype)

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(jax.tree.map(put, batch))
        except BaseException as e:
            # Surface pipeline crashes to the consumer — swallowing them
            # here would make a mid-run input failure indistinguishable
            # from clean exhaustion ("dataset exhausted" -> silent success).
            q.put(e)
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # unblock a producer stuck on q.put
            try:
                q.get_nowait()
            except _queue.Empty:
                break
