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


def prefetch_to_device(
    iterator: Iterator, size: int = 2, sharding: Optional[jax.sharding.Sharding] = None
) -> Iterator:
    """Wrap a host-batch iterator with an N-deep on-device buffer.

    `sharding` (typically NamedSharding(mesh, P('data', ...))) makes the
    device_put itself the scatter over the mesh — no per-chip Python loop.
    """
    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            batch = next(iterator, None)
            if batch is None:
                return
            if sharding is not None:
                batch = jax.tree.map(
                    lambda x: jax.device_put(x, sharding), batch
                )
            else:
                batch = jax.tree.map(jax.device_put, batch)
            queue.append(batch)

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
