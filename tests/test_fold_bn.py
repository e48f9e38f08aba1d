"""BN-folding tests: folded variables must reproduce unfolded eval logits
(exact algebraic transform, VERDICT r1 Next #2)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.models.gvcnn import build_model, init_model
from gvcnn_tf_tpu.utils import fold_batch_norm


def _randomized_stats(variables, seed=0):
    """Give BN non-trivial running stats so folding actually does work."""
    rng = np.random.RandomState(seed)

    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        arr = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(
                arr + 0.2 * rng.randn(*arr.shape).astype(arr.dtype)
            )
        if name == "var":
            return jnp.asarray(
                arr * rng.uniform(0.7, 1.5, arr.shape).astype(arr.dtype)
            )
        return leaf

    return {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"]
        ),
    }


def _small_cfg(backbone):
    cfg = get_config("mn10_8view").replace(
        backbone=backbone,
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, height=64, width=64, num_views=2, batch_size=2
        )
    )


@pytest.mark.parametrize(
    "backbone", ["inception_v1", "inception_v2", "resnet50"]
)
def test_folded_matches_unfolded_logits(backbone):
    """inception (use_scale=False, eps 1e-3), v2 (separable stem), resnet
    (gamma present, eps 1e-5) — all three fold patterns."""
    cfg = _small_cfg(backbone)
    model, variables = init_model(
        cfg, jax.random.key(0), input_shape=(2, 2, 64, 64, 3)
    )
    variables = _randomized_stats(variables)
    folded = fold_batch_norm(variables)

    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 2, 64, 64, 3).astype(np.float32)
    )
    apply = jax.jit(functools.partial(model.apply, train=False))
    ref, _ = apply(variables, x)
    got, _ = apply(folded, x)
    # Exact up to fp32 reassociation; tolerance scaled to logit magnitude.
    ref_np = np.asarray(ref)
    np.testing.assert_allclose(
        np.asarray(got), ref_np,
        rtol=5e-4, atol=1e-5 + 1e-5 * np.abs(ref_np).max(),
    )


def test_fold_changes_kernels_and_neutralizes_bn():
    cfg = _small_cfg("inception_v1")
    _, variables = init_model(
        cfg, jax.random.key(0), input_shape=(1, 2, 64, 64, 3)
    )
    variables = _randomized_stats(variables, seed=3)
    folded = fold_batch_norm(variables)
    k0 = np.asarray(
        variables["params"]["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    k1 = np.asarray(
        folded["params"]["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    assert np.abs(k0 - k1).max() > 1e-4          # scale actually folded in
    bn = folded["batch_stats"]["InceptionV1"]["Conv2d_1a_7x7"]["BatchNorm"]
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(bn["var"]), 1.0 - 1e-3, rtol=1e-6)
    # Input tree untouched (pure transform).
    assert np.abs(
        np.asarray(
            variables["batch_stats"]["InceptionV1"]["Conv2d_1a_7x7"]
            ["BatchNorm"]["mean"]
        )
    ).max() > 0


def test_export_uses_folded_graph():
    """Exported (folded) artifact reproduces the unfolded logits."""
    from gvcnn_tf_tpu.tools.export_model import (
        deserialize_and_call,
        export_model,
    )

    cfg = _small_cfg("inception_v1")
    model, variables = init_model(
        cfg, jax.random.key(0), input_shape=(2, 2, 64, 64, 3)
    )

    class _S:  # minimal state shim for export_model(state=...)
        params = variables["params"]
        batch_stats = _randomized_stats(variables, seed=5)["batch_stats"]

    blob = export_model(cfg, state=_S, batch_size=2, fold_bn=True)
    x = jnp.asarray(
        np.random.RandomState(2).randn(2, 2, 64, 64, 3).astype(np.float32)
    )
    logits, _ = deserialize_and_call(blob, x)
    ref, _ = jax.jit(functools.partial(model.apply, train=False))(
        {"params": _S.params, "batch_stats": _S.batch_stats}, x
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
