"""GVCNN grouping head — pure-jnp, static-shaped oracle implementation.

Mirrors the reference's grouping helpers (reference gvcnn.py [U]:
`grouping_scheme`, `grouping_weight`, `view_pooling`, `group_fusion`;
SURVEY.md C4b-C4e and Appendix B), re-expressed as mask math so everything
stays static-shaped under XLA: no gather/scatter, no host round-trip, no
data-dependent shapes.

Math (GVCNN paper, CVPR 2018; SURVEY.md Appendix B):
  scores xi_i in (0,1) per view;  group id g_i = ceil(xi_i * M) clamped to
  [1, M];  group descriptor D_j = elementwise max over member views;  group
  weight w_j = mean of member scores, normalized over non-empty groups;
  shape descriptor D = sum_j w_hat_j * D_j.

The ceil-bucketing is non-differentiable in the reference; we replicate its
training dynamics with `stop_gradient` on the membership mask so scores
receive gradient only through the fusion weights (SURVEY.md section 7
"Hard parts").

Conventions:
  scores: (B, V) float   —  in (0, 1)
  descs:  (B, V, C) float
  mask:   (B, M, V) 0/1 float  — mask[b, j, i] = 1 iff view i is in group j
          (matches the reference's (M, V) `group_scheme` layout)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "squash_scores",
    "grouping_scheme",
    "grouping_weight",
    "view_pooling",
    "group_fusion",
    "group_and_fuse",
]


def squash_scores(raw: jnp.ndarray, method: str = "softmax") -> jnp.ndarray:
    """Squash raw FCN outputs (B, V) into discrimination scores in (0, 1).

    `softmax` normalizes over the view axis (BASELINE.json north star:
    "softmax score-based view grouping"); `sigmoid` is the paper's per-view
    squash; `sigmoid_log` is the sigmoid(log|x|) variant seen in the
    reference repo family (SURVEY.md C4a [MED]).
    """
    if method == "softmax":
        return jax.nn.softmax(raw, axis=-1)
    if method == "sigmoid":
        return jax.nn.sigmoid(raw)
    if method == "sigmoid_log":
        return jax.nn.sigmoid(jnp.log(jnp.abs(raw) + 1e-8))
    raise ValueError(f"unknown score squash {method!r}")


def grouping_scheme(scores: jnp.ndarray, num_group: int) -> jnp.ndarray:
    """Bucket views into M groups by score (reference `grouping_scheme` [U]).

    Group j (1-indexed) covers the interval ((j-1)/M, j/M]; view i goes to
    group ceil(score_i * M), clamped to [1, M].  Returns a 0/1 float mask of
    shape (B, M, V).  Non-differentiable by construction (the caller applies
    stop_gradient; hard ceil has zero gradient anyway).
    """
    m = jnp.asarray(num_group, scores.dtype)
    gid = jnp.clip(jnp.ceil(scores * m) - 1.0, 0.0, num_group - 1.0)
    gid = gid.astype(jnp.int32)                      # (B, V)
    onehot = jax.nn.one_hot(gid, num_group, dtype=scores.dtype)  # (B, V, M)
    return jnp.swapaxes(onehot, -1, -2)              # (B, M, V)


def grouping_weight(
    scores: jnp.ndarray, scheme: jnp.ndarray, mode: str = "mean"
) -> jnp.ndarray:
    """Group weights, normalized over non-empty groups.

    `mode` selects the raw (pre-normalization) weight per group j:
      * "mean"     — sum(member scores) / count (reference `grouping_weight`
        [U], the sum/count variant of SURVEY.md Appendix B.4 [MED]).
      * "ceil_sum" — ceil(sum(member scores)) / count, the GVCNN paper's
        ceiling-of-sum variant (SURVEY.md Appendix B.4).  The reference's
        exact semantics are [MED]-confidence, so both are selectable
        (GVCNNConfig.group_weight).

    Empty groups get weight 0.  Returns (B, M), rows summing to 1 whenever
    at least one group is non-empty.

    Gradient note: `scheme` must already be stop_gradient'ed by the caller;
    scores flow through the sum so d(weight)/d(score) matches the reference.
    For "ceil_sum" the ceil is applied straight-through (forward = ceil,
    gradient = identity) so the scoring FCN still receives gradient through
    the weights — a plain ceil has zero gradient a.e., which combined with
    the stop_gradient'ed scheme would leave the FCN untrainable.
    """
    counts = jnp.sum(scheme, axis=-1)                          # (B, M)
    ssum = jnp.einsum("bmv,bv->bm", scheme, scores)            # (B, M)
    if mode == "ceil_sum":
        # straight-through ceil: forward ceil(ssum), backward d/dssum = 1
        ssum = ssum + jax.lax.stop_gradient(jnp.ceil(ssum) - ssum)
    elif mode != "mean":
        raise ValueError(f"unknown group weight mode {mode!r}")
    raw = ssum / jnp.maximum(counts, 1.0)                      # 0 for empty
    total = jnp.sum(raw, axis=-1, keepdims=True)
    return raw / jnp.maximum(total, 1e-12)


def view_pooling(descs: jnp.ndarray, scheme: jnp.ndarray) -> jnp.ndarray:
    """Intra-group element-wise max over member views (reference
    `view_pooling` [U], SURVEY.md C4d).

    descs (B, V, C), scheme (B, M, V) -> (B, M, C).  Views outside a group
    are masked to -inf before the max; empty groups come out as 0 (they are
    excluded from fusion by their zero weight, and zeroing avoids -inf
    NaN-poisoning the weighted sum).
    """
    neg = jnp.asarray(jnp.finfo(descs.dtype).min, descs.dtype)
    # (B, M, V, C) masked broadcast — small (V, M <= 16); the Pallas kernel
    # in ops/pallas_grouping.py avoids materializing it in HBM.
    masked = jnp.where(scheme[..., None] > 0, descs[:, None, :, :], neg)
    pooled = jnp.max(masked, axis=2)                           # (B, M, C)
    nonempty = jnp.sum(scheme, axis=-1, keepdims=True) > 0     # (B, M, 1)
    return jnp.where(nonempty, pooled, 0.0)


def group_fusion(pooled: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Score-weighted sum of group descriptors (reference `group_fusion` [U]).

    pooled (B, M, C), weights (B, M) -> (B, C).  Weights are already
    normalized over non-empty groups, so this is the weighted mean
    D = sum_j w_hat_j D_j of SURVEY.md Appendix B.5.
    """
    return jnp.einsum("bm,bmc->bc", weights, pooled)


def group_and_fuse(
    scores: jnp.ndarray,
    descs: jnp.ndarray,
    num_group: int,
    weight_mode: str = "mean",
):
    """Full grouping head: scheme -> weights -> pooling -> fusion.

    Returns (shape_descriptor (B, C), weights (B, M), scheme (B, M, V)).
    This is the oracle the Pallas kernel is tested against and the VJP it
    reuses.  stop_gradient on the scheme replicates the reference's
    non-differentiable bucketing (scores learn only through the weights).
    `weight_mode` selects the grouping_weight variant (mean | ceil_sum).
    """
    scheme = jax.lax.stop_gradient(grouping_scheme(scores, num_group))
    weights = grouping_weight(scores, scheme, weight_mode)
    pooled = view_pooling(descs, scheme)
    fused = group_fusion(pooled, weights)
    return fused, weights, scheme
