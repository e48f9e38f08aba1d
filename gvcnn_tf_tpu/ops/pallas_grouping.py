"""Fused Pallas TPU kernel for the GVCNN grouping head (SURVEY.md B2).

One kernel fuses score-bucketing -> membership mask -> masked segment-max
(view pooling) -> weight computation -> normalized weighted fusion, so the
FORWARD pass reads `descs` from HBM exactly once and never materializes the
(B, M, V, C) masked broadcast the jnp oracle creates (ops/grouping.py).
The fusion claim is forward-only: the custom VJP below replays the jnp
oracle's backward, which DOES materialize that broadcast in the backward
pass (see docs/DESIGN.md).  Measured on v5e the whole head is <1 ms of an
~80 ms step either way, which is why the production default remains the
XLA-fused oracle and this kernel stays opt-in (docs/PERF_VARIANTS.md).

Per-shape work is tiny (V <= 16 views, M <= 16 groups, C = 1024 channels),
so the grid is one program per shape: block (V, C) descriptors in VMEM,
a static Python loop over the M groups on the VPU (M is a compile-time
constant — no dynamic control flow), everything in fp32.

Gradients: the kernel is forward-only; a custom VJP replays the pure-jnp
oracle's backward (`jax.vjp(group_and_fuse)`), which guarantees the exact
reference training dynamics (stop_gradient on bucketing, score grads
through fusion weights only — SURVEY.md Appendix B).

Kernel parity is tested in interpret mode on CPU against the oracle
(tests/test_pallas_grouping.py), per the SURVEY.md section 4 strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvcnn_tf_tpu.ops import grouping as G

_NEG = float(jnp.finfo(jnp.float32).min)


def _grouping_kernel(scores_ref, descs_ref, fused_ref, weights_ref, scheme_ref,
                     *, num_group: int, weight_mode: str):
    """One program per shape: scores (1, 1, V), descs (1, V, C) in VMEM.

    Mosaic requires the last two block dims to be (8,128)-aligned OR span
    the full array, so every ref carries a leading per-shape axis and its
    trailing dims are whole (V, C, M are tiny and unaligned).
    """
    s = scores_ref[0]                          # (1, V) fp32
    d = descs_ref[0]                           # (V, C) fp32
    V = s.shape[-1]
    M = num_group

    # Bucketize: group id = clip(ceil(s*M) - 1, 0, M-1).  Fully vectorized —
    # Mosaic rejects scalar VMEM stores and lowers 2D vector ops best, so the
    # whole head is (M, V)/(M, C)-shaped VPU math with no scalar loop.
    gid = jnp.clip(jnp.ceil(s * M) - 1.0, 0.0, M - 1.0).astype(jnp.int32)
    jids = jax.lax.broadcasted_iota(jnp.int32, (M, V), 0)      # row j == j
    scheme = (jids == gid).astype(jnp.float32)                 # (M, V)

    cnt = jnp.sum(scheme, axis=1, keepdims=True)               # (M, 1)
    ssum = jnp.sum(scheme * s, axis=1, keepdims=True)          # (M, 1)
    if weight_mode == "ceil_sum":                 # paper's ceil-of-sum variant
        ssum = jnp.ceil(ssum)                     # forward only; VJP replays
    w = ssum / jnp.maximum(cnt, 1.0)              # the oracle (incl. its STE)

    # Masked segment-max without materializing (M, V, C) in HBM: it lives
    # only as a VPU temporary in VMEM (M*V*C fp32 <= ~400 KB for the
    # flagship sizes).
    masked = jnp.where(scheme[:, :, None] > 0, d[None, :, :], _NEG)
    pooled = jnp.max(masked, axis=1)                           # (M, C)
    pooled = jnp.where(cnt > 0, pooled, 0.0)

    inv = 1.0 / jnp.maximum(jnp.sum(w), 1e-12)
    fused_ref[0] = jnp.sum(w * pooled, axis=0, keepdims=True) * inv  # (1, C)
    weights_ref[0] = (w * inv).reshape(1, M)
    scheme_ref[0] = scheme


def _pallas_forward(scores, descs, num_group: int, weight_mode: str,
                    interpret: bool):
    B, V = scores.shape
    C = descs.shape[-1]
    M = num_group
    kernel = functools.partial(
        _grouping_kernel, num_group=M, weight_mode=weight_mode
    )
    fused, weights, scheme = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, V), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, V), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((B, M, V), jnp.float32),
        ),
        interpret=interpret,
    )(scores.astype(jnp.float32)[:, None, :], descs.astype(jnp.float32))
    return fused[:, 0, :], weights[:, 0, :], scheme


@functools.lru_cache(maxsize=None)
def _make_fused_op(num_group: int, weight_mode: str, interpret: bool):
    @jax.custom_vjp
    def op(scores, descs):
        return _pallas_forward(scores, descs, num_group, weight_mode,
                               interpret)

    def fwd(scores, descs):
        return op(scores, descs), (scores, descs)

    def bwd(res, cotangents):
        scores, descs = res
        # Replay the oracle's VJP — bit-identical training dynamics with
        # ops/grouping.py (stop_gradient on the scheme included, and the
        # straight-through ceil gradient for the ceil_sum variant).
        _, vjp_fn = jax.vjp(
            lambda s, d: G.group_and_fuse(s, d, num_group, weight_mode),
            scores, descs,
        )
        return vjp_fn(cotangents)

    op.defvjp(fwd, bwd)
    return op


def group_and_fuse_pallas(scores, descs, num_group: int,
                          weight_mode: str = "mean", *, interpret=None):
    """Drop-in replacement for ops.grouping.group_and_fuse.

    scores (B, V), descs (B, V, C) -> (fused (B, C), weights (B, M),
    scheme (B, M, V)).  `interpret` defaults to True off-TPU so CPU tests
    exercise the same kernel code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_fused_op(num_group, weight_mode, bool(interpret))(
        scores, descs
    )
