"""Device mesh + sharding helpers (SPMD data parallelism over ICI).

Scaling-book recipe: pick a mesh, annotate shardings on the jit boundary,
let XLA insert the collectives (psum for the DP gradient all-reduce rides
ICI on a real slice).  The same code runs on the driver's virtual
8-CPU-device mesh (`--xla_force_host_platform_device_count=8`) — the
"multi-node without a cluster" test strategy from SURVEY.md section 4.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested {n} devices but only {len(devices)} visible; "
            "set XLA_FLAGS=--xla_force_host_platform_device_count for tests"
        )
    return Mesh(np.asarray(devices[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """device_put a host batch so each chip holds only its shard."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
