"""Merged Inception branch convs: exact equivalence with the unmerged
Mixed block (models/backbones/inception_v1.py::InceptionBlock
merge_branches). The merge is an MXU-lane-occupancy layout optimization;
math and checkpoints must be identical."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.models.backbones.inception_v1 import (
    InceptionBlock,
    InceptionV1Base,
)


def _block(merge):
    # Mixed_3b plan: the worst MXU offender (16/32-channel branches).
    return InceptionBlock(64, 96, 128, 16, 32, 32, merge_branches=merge,
                          name="Mixed_3b")


@pytest.mark.parametrize("merge", ["1x1", "full"])
def test_block_outputs_match_unmerged(merge):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 192).astype(np.float32))
    ref_mod = _block("none")
    variables = jax.jit(functools.partial(ref_mod.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    v2 = jax.jit(functools.partial(_block(merge).init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    # Identical parameter/stat trees -> checkpoints swap freely.
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, v2
    )

    ref = jax.jit(functools.partial(ref_mod.apply, train=False))(
        variables, x
    )
    got = jax.jit(functools.partial(_block(merge).apply, train=False))(
        variables, x
    )
    assert got.shape == ref.shape == (2, 8, 8, 256)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("merge", ["1x1", "full"])
def test_backbone_forward_identical_with_merge(merge):
    """Full truncated backbone: flipping merge_branches with the SAME
    variables changes nothing numerically."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    base = InceptionV1Base(final_endpoint="Mixed_3c")
    variables = jax.jit(functools.partial(base.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    ref, _ = jax.jit(functools.partial(base.apply, train=False))(
        variables, x
    )
    alt = InceptionV1Base(final_endpoint="Mixed_3c", merge_branches=merge)
    got, _ = jax.jit(functools.partial(alt.apply, train=False))(
        variables, x
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_per_block_merge_overrides():
    """'1x1,Mixed_3b=full' spec: Mixed_3b runs the block-diagonal merge,
    everything else the default — still numerically identical."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    base = InceptionV1Base(final_endpoint="Mixed_3c")
    variables = jax.jit(functools.partial(base.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    ref, _ = jax.jit(functools.partial(base.apply, train=False))(
        variables, x
    )
    alt = InceptionV1Base(
        final_endpoint="Mixed_3c",
        merge_branches="1x1,Mixed_3b=full,Mixed_3c=full",
    )
    got, _ = jax.jit(functools.partial(alt.apply, train=False))(
        variables, x
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # policy resolution
    assert alt._merge_for("Mixed_3b") == "full"
    assert alt._merge_for("Mixed_4b") == "1x1"
    assert InceptionV1Base(merge_branches="none,Mixed_3c=1x1")._merge_for(
        "Mixed_3c") == "1x1"


def test_merge_override_spec_validation():
    with pytest.raises(ValueError, match="unknown block"):
        InceptionV1Base(merge_branches="1x1,Mixed_9z=full")._merge_for(
            "Mixed_3b")
    with pytest.raises(ValueError, match="bad merge policy"):
        InceptionV1Base(merge_branches="wide")._merge_for("Mixed_3b")
    with pytest.raises(ValueError, match="bad merge policy"):
        InceptionV1Base(merge_branches="1x1,Mixed_3b=wide")._merge_for(
            "Mixed_3b")
    with pytest.raises(ValueError, match="first term"):
        InceptionV1Base(merge_branches="Mixed_3b=full,1x1")._merge_for(
            "Mixed_3b")


@pytest.mark.parametrize("merge", ["1x1", "full"])
def test_merge_gradients_match(merge):
    """Training dynamics unchanged: per-branch kernel/BN grads and the
    updated batch statistics agree with the unmerged block."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 6, 192).astype(np.float32))
    ref_mod, alt_mod = _block("none"), _block(merge)
    variables = jax.jit(functools.partial(ref_mod.init, train=False))(
        {"params": jax.random.key(3)}, x
    )

    def loss(mod, params):
        out, upd = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2), upd["batch_stats"]

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(functools.partial(loss, ref_mod), has_aux=True)
    )(variables["params"])
    (l2, bs2), g2 = jax.jit(
        jax.value_and_grad(functools.partial(loss, alt_mod), has_aux=True)
    )(variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (p, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=str(p),
        )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(bs1)[0],
        jax.tree_util.tree_flatten_with_path(bs2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=str(p),
        )
