"""Pallas fused grouping kernel vs the pure-jnp oracle (interpret mode on
CPU — SURVEY.md section 4 "Pallas kernels")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gvcnn_tf_tpu.ops import grouping as G
from gvcnn_tf_tpu.ops.pallas_grouping import group_and_fuse_pallas


@pytest.mark.parametrize("B,V,M,C", [(2, 12, 8, 128), (3, 8, 4, 256), (1, 12, 8, 1024)])
def test_forward_matches_oracle(B, V, M, C):
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.uniform(0.01, 0.99, (B, V)).astype(np.float32))
    descs = jnp.asarray(rng.randn(B, V, C).astype(np.float32))

    fused_p, w_p, sch_p = group_and_fuse_pallas(scores, descs, M, interpret=True)
    fused_j, w_j, sch_j = G.group_and_fuse(scores, descs, M)

    np.testing.assert_array_equal(np.asarray(sch_p), np.asarray(sch_j))
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_j), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fused_p), np.asarray(fused_j),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["mean", "ceil_sum"])
def test_weight_modes_match_oracle(mode):
    """Both grouping_weight variants fused in-kernel (VERDICT Next #5)."""
    B, V, M, C = 2, 12, 8, 128
    rng = np.random.RandomState(4)
    scores = jnp.asarray(rng.uniform(0.01, 0.99, (B, V)).astype(np.float32))
    descs = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    out_p = group_and_fuse_pallas(scores, descs, M, mode, interpret=True)
    out_j = G.group_and_fuse(scores, descs, M, mode)
    for a, b in zip(out_p, out_j):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def loss_p(s, d):
        f, w, _ = group_and_fuse_pallas(s, d, M, mode, interpret=True)
        return jnp.sum(f ** 2) + jnp.sum(w ** 2)

    def loss_j(s, d):
        f, w, _ = G.group_and_fuse(s, d, M, mode)
        return jnp.sum(f ** 2) + jnp.sum(w ** 2)

    for a, b in zip(jax.grad(loss_p, (0, 1))(scores, descs),
                    jax.grad(loss_j, (0, 1))(scores, descs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_empty_groups_no_nan():
    scores = jnp.array([[0.05, 0.06, 0.95, 0.96]])
    descs = jnp.ones((1, 4, 128))
    fused, w, _ = group_and_fuse_pallas(scores, descs, 8, interpret=True)
    assert np.isfinite(np.asarray(fused)).all()
    np.testing.assert_allclose(np.asarray(fused), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w).sum(), 1.0, rtol=1e-6)


def test_vjp_matches_oracle():
    """Backward replays the oracle VJP -> gradients must match exactly."""
    B, V, M, C = 2, 8, 4, 64
    rng = np.random.RandomState(1)
    scores = jnp.asarray(rng.uniform(0.05, 0.95, (B, V)).astype(np.float32))
    descs = jnp.asarray(rng.randn(B, V, C).astype(np.float32))

    def loss_pallas(s, d):
        fused, w, _ = group_and_fuse_pallas(s, d, M, interpret=True)
        return jnp.sum(fused ** 2) + jnp.sum(w ** 2)

    def loss_oracle(s, d):
        fused, w, _ = G.group_and_fuse(s, d, M)
        return jnp.sum(fused ** 2) + jnp.sum(w ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(scores, descs)
    go = jax.grad(loss_oracle, argnums=(0, 1))(scores, descs)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_jit_wrapped():
    B, V, M, C = 2, 12, 8, 128
    rng = np.random.RandomState(2)
    scores = jnp.asarray(rng.uniform(0.01, 0.99, (B, V)).astype(np.float32))
    descs = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    f = jax.jit(lambda s, d: group_and_fuse_pallas(s, d, M, interpret=True)[0])
    out = f(scores, descs)
    ref = G.group_and_fuse(scores, descs, M)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
