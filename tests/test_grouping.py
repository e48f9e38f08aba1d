"""Unit tests for the pure-jnp grouping oracle vs a NumPy reference.

Covers the SURVEY.md section 4 unit-test list: bucketization edge cases
(empty groups, all-equal scores, score==1.0 boundary), masked segment-max ==
per-group max, fusion-weight normalization, and the stop_gradient placement
that replicates the reference's non-differentiable bucketing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gvcnn_tf_tpu.ops import grouping as G


def np_group_ids(scores, M):
    gid = np.ceil(scores * M) - 1
    return np.clip(gid, 0, M - 1).astype(np.int32)


def np_reference(scores, descs, M):
    """Straight-line NumPy implementation of SURVEY.md Appendix B."""
    B, V = scores.shape
    C = descs.shape[-1]
    gids = np_group_ids(scores, M)
    scheme = np.zeros((B, M, V), np.float32)
    for b in range(B):
        for i in range(V):
            scheme[b, gids[b, i], i] = 1.0
    weights = np.zeros((B, M), np.float32)
    pooled = np.zeros((B, M, C), np.float32)
    for b in range(B):
        means = np.zeros(M)
        for j in range(M):
            members = [i for i in range(V) if gids[b, i] == j]
            if members:
                means[j] = np.mean([scores[b, i] for i in members])
                pooled[b, j] = np.max(descs[b, members], axis=0)
        total = means.sum()
        if total > 0:
            weights[b] = means / total
    fused = np.einsum("bm,bmc->bc", weights, pooled)
    return fused, weights, scheme, pooled


@pytest.mark.parametrize("M", [4, 8])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_numpy_oracle(M, seed):
    rng = np.random.RandomState(seed)
    B, V, C = 3, 12, 64
    scores = rng.uniform(0.01, 0.99, (B, V)).astype(np.float32)
    descs = rng.randn(B, V, C).astype(np.float32)

    fused, weights, scheme = jax.tree.map(
        np.asarray, G.group_and_fuse(jnp.asarray(scores), jnp.asarray(descs), M)
    )
    fused_np, weights_np, scheme_np, pooled_np = np_reference(scores, descs, M)

    np.testing.assert_array_equal(scheme, scheme_np)
    np.testing.assert_allclose(weights, weights_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fused, fused_np, rtol=1e-5, atol=1e-5)

    pooled = np.asarray(
        G.view_pooling(jnp.asarray(descs),
                       jnp.asarray(scheme_np))
    )
    np.testing.assert_allclose(pooled, pooled_np, rtol=1e-6, atol=1e-6)


def test_bucket_boundaries():
    # Group j covers ((j-1)/M, j/M]: ceil-bucketing with clamping.
    M = 4
    scores = jnp.array([[0.0, 0.24, 0.25, 0.26, 0.5, 0.75, 0.99, 1.0]])
    scheme = G.grouping_scheme(scores, M)
    gids = np.argmax(np.asarray(scheme), axis=1)[0]
    # 0.0 clamps into group 0; 0.25 -> ceil(1.0)=1 -> group 0; 1.0 clamps to
    # the last group.
    np.testing.assert_array_equal(gids, [0, 0, 0, 1, 1, 2, 3, 3])


def test_all_equal_scores_single_group():
    M = 8
    scores = jnp.full((2, 12), 0.5)
    scheme = G.grouping_scheme(scores, M)
    counts = np.asarray(scheme.sum(-1))
    assert (counts[:, 3] == 12).all()          # ceil(0.5*8)=4 -> group idx 3
    assert counts.sum() == 24
    w = np.asarray(G.grouping_weight(scores, scheme))
    np.testing.assert_allclose(w[:, 3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)


def test_empty_groups_masked_out():
    M = 8
    scores = jnp.array([[0.05, 0.06, 0.95, 0.96]])   # groups 0 and 7 only
    descs = jnp.ones((1, 4, 16))
    fused, weights, scheme = G.group_and_fuse(scores, descs, M)
    w = np.asarray(weights)[0]
    assert w[0] > 0 and w[7] > 0
    assert np.all(w[1:7] == 0)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # Descriptors are all ones -> fused must be exactly ones (no -inf/NaN
    # leakage from the six empty groups).
    np.testing.assert_allclose(np.asarray(fused), 1.0, rtol=1e-6)


def test_weight_normalization_over_nonempty():
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.uniform(0.01, 0.99, (4, 8)).astype(np.float32))
    scheme = G.grouping_scheme(scores, 8)
    w = np.asarray(G.grouping_weight(scores, scheme))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert (w >= 0).all()


def test_gradients_flow_through_weights_only():
    """Reference training dynamics: d(fused)/d(scores) exists and is finite,
    but bucketing itself contributes no gradient (stop_gradient on scheme)."""
    M, B, V, C = 4, 2, 6, 8
    rng = np.random.RandomState(3)
    scores = jnp.asarray(rng.uniform(0.1, 0.9, (B, V)).astype(np.float32))
    descs = jnp.asarray(rng.randn(B, V, C).astype(np.float32))

    def loss(s):
        fused, _, _ = G.group_and_fuse(s, descs, M)
        return jnp.sum(fused ** 2)

    g = jax.grad(loss)(scores)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0    # weights path is differentiable

    # Moving a score WITHIN its bucket changes the loss smoothly (weights
    # path); the jump at bucket edges carries no gradient.
    def loss_descs(d):
        fused, _, _ = G.group_and_fuse(scores, d, M)
        return jnp.sum(fused ** 2)

    gd = jax.grad(loss_descs)(descs)
    assert np.isfinite(np.asarray(gd)).all()


def test_squash_methods():
    raw = jnp.asarray(np.random.RandomState(0).randn(2, 12).astype(np.float32))
    sm = np.asarray(G.squash_scores(raw, "softmax"))
    np.testing.assert_allclose(sm.sum(-1), 1.0, rtol=1e-5)
    sg = np.asarray(G.squash_scores(raw, "sigmoid"))
    assert ((sg > 0) & (sg < 1)).all()
    sl = np.asarray(G.squash_scores(raw, "sigmoid_log"))
    assert ((sl > 0) & (sl < 1)).all()
    with pytest.raises(ValueError):
        G.squash_scores(raw, "nope")


def test_jit_and_vmap_compatible():
    """The head must be jit-traceable with static shapes (no host sync)."""
    M = 8
    f = jax.jit(lambda s, d: G.group_and_fuse(s, d, M)[0])
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.uniform(0.01, 0.99, (2, 12)).astype(np.float32))
    d = jnp.asarray(rng.randn(2, 12, 32).astype(np.float32))
    out = f(s, d)
    assert out.shape == (2, 32)
