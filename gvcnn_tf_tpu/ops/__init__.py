"""TPU-native ops for the GVCNN grouping head.

`grouping` is the pure-jnp oracle (static-shaped mask math, XLA-friendly);
`pallas_grouping` is the fused Pallas kernel with the oracle as its VJP.
"""

from gvcnn_tf_tpu.ops.grouping import (  # noqa: F401
    grouping_scheme,
    grouping_weight,
    view_pooling,
    group_fusion,
    group_and_fuse,
    squash_scores,
)
