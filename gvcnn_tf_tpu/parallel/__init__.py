"""Parallelism layer (build-side B1, SURVEY.md section 2).

The reference is single-process single-GPU; distribution here is XLA
collectives over ICI: a 1-D `data` mesh, replicated params, batch sharded on
`data`, gradient all-reduce inserted by the compiler from the shardings.
"""

from gvcnn_tf_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)

from gvcnn_tf_tpu.parallel.multihost import (  # noqa: F401
    initialize_distributed,
    make_global_batch,
)
