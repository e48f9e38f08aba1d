"""Multi-host (pod) scaffolding for data-parallel training.

Single-slice v5e-8 is the round target (SURVEY.md section 5: DCN out of
scope), but the data-parallel design extends to pods with two pieces:

  * `initialize_distributed()` — jax.distributed bootstrap from the standard
    env (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), no-op when
    single-process, so the same trainer binary runs on one host or many.
  * `make_global_batch()` — assemble a globally-sharded batch from each
    host's local shard via jax.make_array_from_process_local_data; with one
    process it degenerates to a plain sharded device_put, so the code path
    is exercised by the single-host tests.

The train step itself needs NO changes on a pod: params stay replicated,
the batch stays sharded on `data`, and GSPMD's all-reduce spans all hosts'
devices (ICI within a slice).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap jax.distributed from args or env; False if single-process.

    Env (standard JAX multi-process spellings): COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID.  Safe to call unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("PROCESS_ID", "0"))
    )
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Per-host local shard -> global jax.Array sharded over the mesh.

    Each process passes only ITS slice of the global batch (global batch
    size = local batch size * num_processes along dim 0); the result is one
    logical array the jitted step consumes like any other sharded input.
    """
    sharding = NamedSharding(mesh, P(axis))

    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(to_global, local_batch)
