"""On-device image normalization for raw-uint8 host transfers.

The multi-view pipelines store renders as uint8 and the iterator contract
normalizes to float in [-1, 1] on the HOST — at the flagship operating
point (B=32 x 12 views x 224^2) that is ~740 ms of single-core NumPy per
batch against a ~76 ms device step, and 231 MB of float32 (or 115 MB of
bf16) over the host->device link.  `transfer_dtype="uint8"` ships the raw
uint8 bytes instead (58 MB, zero host-side arithmetic) and this helper
performs the identical normalization on device.  Measured on the real
v5e toolchain (tools/check_wire_fusion.py + the r5 wire A/B,
docs/PERF_VARIANTS.md): the normalize does NOT fuse into the stem — it
costs one extra views-sized bf16 materialization (~0.2 ms, within the
measured +0.35 ms-vs-bf16 noise), which the 4x-smaller H2D and the
27.7x host-pipeline win dwarf on host-bound input paths.

Exactness: uint8 -> float32 is exact and the op sequence
`astype(float32) / 255.0 * 2.0 - 1.0` is the same one the host iterator
uses (data/procedural.py) — but XLA's algebraic simplifier may contract
`/255 * 2` into one multiply-by-constant, whose rounding can differ from
the host's two-op sequence by 1 ulp of the input.  Measured effect on the
flagship step: loss agrees to ~2e-6 relative; training behavior is
indistinguishable (tests/test_uint8_transfer.py pins the tolerance).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_views(views: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0, 255] -> float32 [-1, 1]; float inputs pass through.

    Call at the top of every jitted step that consumes pipeline batches
    (train/eval/retrieval).  The dtype test is on the traced aval, so jit
    specializes: float-transfer executables contain no trace of this op.
    """
    if views.dtype == jnp.uint8:
        return views.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return views
