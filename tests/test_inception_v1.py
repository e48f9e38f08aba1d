"""Backbone endpoint-shape tests vs the slim spec (SURVEY.md Appendix A).

All init/apply calls go through jit — eager per-op dispatch is pathologically
slow in this environment.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.models.backbones.inception_v1 import (
    InceptionV1Base,
    ENDPOINTS,
    ENDPOINT_CHANNELS,
)

# (endpoint, H=W spatial size at 224 input) — SURVEY.md Appendix A table.
_EXPECTED_224 = {
    "Conv2d_1a_7x7": 112, "MaxPool_2a_3x3": 56, "Conv2d_2b_1x1": 56,
    "Conv2d_2c_3x3": 56, "MaxPool_3a_3x3": 28, "Mixed_3b": 28,
    "Mixed_3c": 28, "MaxPool_4a_3x3": 14, "Mixed_4b": 14, "Mixed_4c": 14,
    "Mixed_4d": 14, "Mixed_4e": 14, "Mixed_4f": 14, "MaxPool_5a_2x2": 7,
    "Mixed_5b": 7, "Mixed_5c": 7,
}


def jinit(model, x):
    return jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x
    )


@pytest.fixture(scope="module")
def v1_small():
    """Full v1 initialized once at 64x64, shared by the cheap tests."""
    model = InceptionV1Base()
    x = jnp.zeros((2, 64, 64, 3))
    variables = jinit(model, x)
    return model, variables


def test_all_endpoint_shapes_match_slim():
    # Shape-only check: eval_shape costs no FLOPs, so run it at full 224.
    model = InceptionV1Base()
    x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": jax.random.key(0)}, x,
    )
    _, endpoints = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    assert set(endpoints) == set(ENDPOINTS)
    for name in ENDPOINTS:
        s = _EXPECTED_224[name]
        c = ENDPOINT_CHANNELS[name]
        assert endpoints[name].shape == (1, s, s, c), name


def test_final_endpoint_truncation():
    model = InceptionV1Base(final_endpoint="Mixed_3c")
    x = jnp.zeros((2, 64, 64, 3))
    variables = jinit(model, x)
    feats, endpoints = jax.jit(
        functools.partial(model.apply, train=False)
    )(variables, x)
    assert feats.shape == (2, 8, 8, 480)
    assert "Mixed_4b" not in endpoints     # construction stops at the tap
    # Param tree must also be truncated (no dead blocks instantiated).
    assert not any("Mixed_4" in k for k in variables["params"])


def test_small_input_runs(v1_small):
    # 64x64 inputs (used by dryrun_multichip / fast tests) must flow: the
    # stride chain /32 leaves 2x2 at Mixed_5c.
    model, variables = v1_small
    feats, _ = jax.jit(functools.partial(model.apply, train=False))(
        variables, jnp.zeros((2, 64, 64, 3))
    )
    assert feats.shape == (2, 2, 2, 1024)


def test_params_are_fp32_and_bf16_compute(v1_small):
    _, variables = v1_small
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    # bf16 module reuses the same fp32 params; output must be bf16.
    model16 = InceptionV1Base(dtype=jnp.bfloat16)
    feats, _ = jax.jit(functools.partial(model16.apply, train=False))(
        variables, jnp.zeros((2, 64, 64, 3))
    )
    assert feats.dtype == jnp.bfloat16


def test_batchnorm_stats_update_in_train_mode():
    model = InceptionV1Base(final_endpoint="Conv2d_1a_7x7")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    variables = jinit(model, x)
    _, updates = jax.jit(
        functools.partial(model.apply, train=True, mutable=["batch_stats"])
    )(variables, x)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


# ---------------------------------------------------------------------------
# Selective remat (remat_until): the prefix through the named endpoint runs
# under jax.checkpoint — math, params, and endpoints must be IDENTICAL to
# the plain tower; only the backward-pass memory schedule changes.
# ---------------------------------------------------------------------------


def _loss_fn(model, variables, x):
    feats, _ = model.apply(variables, x, train=False)
    return jnp.sum(feats ** 2)


def test_remat_until_exact_forward_backward(v1_small):
    base_model, variables = v1_small
    remat_model = InceptionV1Base(remat_until="MaxPool_3a_3x3")
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 64, 64, 3), jnp.float32
    )

    # Param trees identical: remat must not rename/move any module.
    remat_vars = jinit(remat_model, x)
    assert jax.tree.structure(remat_vars) == jax.tree.structure(variables)

    f_base = jax.jit(functools.partial(base_model.apply, train=False))
    f_remat = jax.jit(functools.partial(remat_model.apply, train=False))
    feats_b, eps_b = f_base(variables, x)
    feats_r, eps_r = f_remat(variables, x)
    np.testing.assert_array_equal(np.asarray(feats_b), np.asarray(feats_r))
    assert list(eps_b) == list(eps_r)
    for k in eps_b:
        np.testing.assert_array_equal(np.asarray(eps_b[k]),
                                      np.asarray(eps_r[k]))

    g_base = jax.jit(jax.grad(functools.partial(_loss_fn, base_model)))(
        variables, x)
    g_remat = jax.jit(jax.grad(functools.partial(_loss_fn, remat_model)))(
        variables, x)
    for pb, pr in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pr),
                                   rtol=1e-5, atol=1e-5)


def test_remat_until_respects_truncation_and_validates():
    # remat boundary inside a truncated [start..final] slice works...
    model = InceptionV1Base(final_endpoint="Mixed_3b",
                            remat_until="Conv2d_2c_3x3")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jinit(model, x)
    feats, eps = jax.jit(functools.partial(model.apply, train=False))(
        variables, x)
    assert feats.shape[-1] == ENDPOINT_CHANNELS["Mixed_3b"]
    # ...and a boundary OUTSIDE the active slice is a loud error.
    bad = InceptionV1Base(final_endpoint="Conv2d_2b_1x1",
                          remat_until="Mixed_4b")
    with pytest.raises(ValueError, match="remat_until"):
        jax.eval_shape(
            functools.partial(bad.init, train=False),
            {"params": jax.random.key(0)}, x)
