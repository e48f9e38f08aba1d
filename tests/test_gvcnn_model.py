"""End-to-end model assembly tests (forward shapes, end_points parity keys).

Init/apply always go through jit (eager dispatch is very slow here); the
heavy GVCNN model is initialized once per module.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.models.gvcnn import init_model

# Small spatial size to keep CPU tests fast; the backbone is fully
# convolutional so shapes scale.
H = W = 64


def small(cfg, **kw):
    return cfg.replace(
        data=dataclasses.replace(cfg.data, height=H, width=W, batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
        **kw,
    )


@pytest.fixture(scope="module")
def gvcnn_8view():
    cfg = small(get_config("mn10_8view"))
    model, variables = init_model(cfg, jax.random.key(0),
                                  input_shape=(2, 8, H, W, 3))
    apply_eval = jax.jit(functools.partial(model.apply, train=False))
    return cfg, model, variables, apply_eval


def test_single_view_classifier_forward():
    cfg = small(get_config("mn10_single_view"))
    model, variables = init_model(cfg, jax.random.key(0),
                                  input_shape=(2, H, W, 3))
    x = jnp.zeros((2, H, W, 3))
    logits, end_points = jax.jit(functools.partial(model.apply, train=False))(
        variables, x
    )
    assert logits.shape == (2, 10)
    assert set(["Logits", "Predictions"]) <= set(end_points)
    np.testing.assert_allclose(
        np.asarray(end_points["Predictions"]).sum(-1), 1.0, rtol=1e-5
    )


def test_gvcnn_forward_shapes_and_endpoints(gvcnn_8view):
    cfg, model, variables, apply_eval = gvcnn_8view
    B, V, M = 2, cfg.data.num_views, cfg.num_group
    x = jnp.asarray(np.random.RandomState(0).rand(B, V, H, W, 3), jnp.float32)
    logits, ep = apply_eval(variables, x)

    assert logits.shape == (B, 10)
    # North-star parity tensors (BASELINE.json:5).
    assert ep["view_discrimination_scores"].shape == (B, V)
    assert ep["group_scheme"].shape == (B, M, V)
    assert ep["group_weight"].shape == (B, M)
    assert ep["shape_descriptor"].shape == (B, 1024)
    assert ep["view_descriptors"].shape == (B, V, 1024)

    scores = np.asarray(ep["view_discrimination_scores"])
    assert ((scores > 0) & (scores < 1)).all()
    np.testing.assert_allclose(
        np.asarray(ep["group_weight"]).sum(-1), 1.0, rtol=1e-5
    )
    # Every view lands in exactly one group.
    np.testing.assert_allclose(
        np.asarray(ep["group_scheme"]).sum(axis=1), 1.0, rtol=1e-6
    )


def test_gvcnn_train_mode_mutates_bn_and_uses_dropout(gvcnn_8view):
    cfg, model, variables, _ = gvcnn_8view
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, H, W, 3), jnp.float32)
    (logits, _), updates = jax.jit(
        functools.partial(model.apply, train=True, mutable=["batch_stats"])
    )(variables, x, rngs={"dropout": jax.random.key(1)})
    assert logits.shape == (2, 10)
    assert "batch_stats" in updates


def test_view_permutation_invariance_of_backbone_descriptors(gvcnn_8view):
    """Folding views into batch must not mix shapes: permuting the view axis
    permutes view descriptors identically and leaves the fused shape
    descriptor unchanged (scores are per-view)."""
    cfg, model, variables, apply_eval = gvcnn_8view
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, H, W, 3), jnp.float32)
    perm = np.array([3, 1, 7, 0, 5, 2, 6, 4])
    _, ep1 = apply_eval(variables, x)
    _, ep2 = apply_eval(variables, x[:, perm])
    np.testing.assert_allclose(
        np.asarray(ep1["view_descriptors"])[:, perm],
        np.asarray(ep2["view_descriptors"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ep1["shape_descriptor"]),
        np.asarray(ep2["shape_descriptor"]),
        rtol=2e-4, atol=2e-5,
    )
