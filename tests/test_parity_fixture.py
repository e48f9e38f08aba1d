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


def test_single_view_degenerate():
    # V=1: one group holds the view, weight exactly 1, fused == descriptor.
    scores = jnp.array([[0.42]], jnp.float32)
    descs = jnp.array([[[7.0, -3.0, 0.5]]], jnp.float32)
    fused, weights, _ = G.group_and_fuse(scores, descs, 8)
    np.testing.assert_allclose(np.asarray(weights).sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fused)[0], [7.0, -3.0, 0.5],
                               rtol=1e-6)
