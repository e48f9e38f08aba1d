"""Hand-computed parity fixtures for the grouping head (SURVEY.md section 4
"Parity tests": fp32 grouping weights/fused descriptor vs hand-worked
numbers from the paper math in SURVEY.md Appendix B).

These are the oracle-of-the-oracle: if ops/grouping.py drifts semantically
(bucket boundaries, empty-group normalization, mean-vs-sum weights), these
exact numbers break.
"""

import numpy as np
import jax.numpy as jnp

from gvcnn_tf_tpu.ops import grouping as G


def test_hand_computed_example_m4():
    # V=4 views, M=4 groups.
    # scores: 0.10 -> ceil(0.4)=1  -> group 0
    #         0.34 -> ceil(1.36)=2 -> group 1
    #         0.36 -> ceil(1.44)=2 -> group 1
    #         0.90 -> ceil(3.6)=4  -> group 3
    scores = jnp.array([[0.10, 0.34, 0.36, 0.90]], jnp.float32)
    descs = jnp.array([[[1.0, 0.0],
                        [0.0, 2.0],
                        [3.0, 1.0],
                        [2.0, 5.0]]], jnp.float32)

    fused, weights, scheme = G.group_and_fuse(scores, descs, 4)

    expected_scheme = np.array([[[1, 0, 0, 0],
                                 [0, 1, 1, 0],
                                 [0, 0, 0, 0],
                                 [0, 0, 0, 1]]], np.float32)
    np.testing.assert_array_equal(np.asarray(scheme), expected_scheme)

    # weights: means (0.10, 0.35, 0, 0.90), sum 1.35
    #   -> (0.074074, 0.259259, 0, 0.666667)
    np.testing.assert_allclose(
        np.asarray(weights)[0],
        [0.10 / 1.35, 0.35 / 1.35, 0.0, 0.90 / 1.35],
        rtol=1e-6,
    )

    # group descriptors: D0=(1,0); D1=max((0,2),(3,1))=(3,2); D3=(2,5)
    # fused = 0.074074*(1,0) + 0.259259*(3,2) + 0.666667*(2,5)
    #       = (0.074074+0.777778+1.333333, 0.518519+3.333333)
    np.testing.assert_allclose(
        np.asarray(fused)[0], [2.185185, 3.851852], rtol=1e-5
    )


def test_hand_computed_boundary_scores():
    # Exact boundaries: score 0.25 with M=4 -> ceil(1.0)=1 -> group 0
    # (interval ((j-1)/M, j/M] is right-closed); 0.0 clamps to group 0;
    # 1.0 clamps to group M-1.
    scores = jnp.array([[0.25, 0.0, 1.0, 0.5]], jnp.float32)
    scheme = np.asarray(G.grouping_scheme(scores, 4))
    gids = np.argmax(scheme[0], axis=0)
    np.testing.assert_array_equal(gids, [0, 0, 3, 1])


def test_hand_computed_ceil_sum_m4():
    # Same fixture as test_hand_computed_example_m4 but with the paper's
    # ceiling-of-sum weight variant (SURVEY.md Appendix B.4):
    #   group 0: sum 0.10 -> ceil 1, count 1 -> 1.0
    #   group 1: sum 0.70 -> ceil 1, count 2 -> 0.5
    #   group 3: sum 0.90 -> ceil 1, count 1 -> 1.0
    #   total 2.5 -> weights (0.4, 0.2, 0, 0.4)
    scores = jnp.array([[0.10, 0.34, 0.36, 0.90]], jnp.float32)
    descs = jnp.array([[[1.0, 0.0],
                        [0.0, 2.0],
                        [3.0, 1.0],
                        [2.0, 5.0]]], jnp.float32)
    fused, weights, scheme = G.group_and_fuse(scores, descs, 4, "ceil_sum")
    np.testing.assert_allclose(
        np.asarray(weights)[0], [0.4, 0.2, 0.0, 0.4], rtol=1e-6
    )
    # fused = 0.4*(1,0) + 0.2*(3,2) + 0.4*(2,5) = (1.8, 2.4)
    np.testing.assert_allclose(np.asarray(fused)[0], [1.8, 2.4], rtol=1e-6)
    # Scheme is weight-mode independent.
    np.testing.assert_array_equal(
        np.asarray(scheme),
        np.asarray(G.group_and_fuse(scores, descs, 4, "mean")[2]),
    )


def _np_weights(scores, scheme, mode):
    """NumPy reference for both weight variants."""
    counts = scheme.sum(-1)
    ssum = np.einsum("bmv,bv->bm", scheme, scores)
    if mode == "ceil_sum":
        ssum = np.ceil(ssum)
    raw = ssum / np.maximum(counts, 1.0)
    return raw / np.maximum(raw.sum(-1, keepdims=True), 1e-12)


def test_all_squash_weight_combinations():
    """Every (score_squash x group_weight) combination vs a NumPy oracle
    (VERDICT round-1 Next #5: fixtures for all variants)."""
    import itertools

    rng = np.random.RandomState(7)
    raw = jnp.asarray(rng.randn(3, 12).astype(np.float32))
    descs = jnp.asarray(rng.randn(3, 12, 16).astype(np.float32))
    M = 8
    for squash, mode in itertools.product(
        ("softmax", "sigmoid", "sigmoid_log"), ("mean", "ceil_sum")
    ):
        scores = G.squash_scores(raw, squash)
        fused, weights, scheme = G.group_and_fuse(scores, descs, M, mode)
        w_np = _np_weights(np.asarray(scores), np.asarray(scheme), mode)
        np.testing.assert_allclose(
            np.asarray(weights), w_np, rtol=1e-5, atol=1e-6,
            err_msg=f"squash={squash} mode={mode}",
        )
        pooled = np.asarray(G.view_pooling(descs, jnp.asarray(scheme)))
        fused_np = np.einsum("bm,bmc->bc", w_np, pooled)
        np.testing.assert_allclose(
            np.asarray(fused), fused_np, rtol=1e-5, atol=1e-5,
            err_msg=f"squash={squash} mode={mode}",
        )


def test_ceil_sum_gradient_is_straight_through():
    """ceil is applied straight-through: scores still receive finite,
    nonzero gradient through the weights (else the FCN couldn't train)."""
    import jax

    rng = np.random.RandomState(5)
    scores = jnp.asarray(rng.uniform(0.1, 0.9, (2, 8)).astype(np.float32))
    descs = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))

    def loss(s):
        fused, _, _ = G.group_and_fuse(s, descs, 4, "ceil_sum")
        return jnp.sum(fused ** 2)

    g = np.asarray(jax.grad(loss)(scores))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_unknown_weight_mode_raises():
    scores = jnp.array([[0.5, 0.5]], jnp.float32)
    scheme = G.grouping_scheme(scores, 4)
    try:
        G.grouping_weight(scores, scheme, "nope")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_single_view_degenerate():
    # V=1: one group holds the view, weight exactly 1, fused == descriptor.
    scores = jnp.array([[0.42]], jnp.float32)
    descs = jnp.array([[[7.0, -3.0, 0.5]]], jnp.float32)
    fused, weights, _ = G.group_and_fuse(scores, descs, 8)
    np.testing.assert_allclose(np.asarray(weights).sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fused)[0], [7.0, -3.0, 0.5],
                               rtol=1e-6)
