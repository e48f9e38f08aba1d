"""Space-to-depth stem: exact equivalence with the plain 7x7/2 stem
(models/backbones/inception_v1.py::SpaceToDepthStem)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.models.backbones.inception_v1 import (
    ConvBNReLU,
    InceptionV1Base,
    SpaceToDepthStem,
)


def test_stem_outputs_match_plain_conv():
    """Same params (identical tree), same output — any input with even
    H/W (TF-SAME pad (2,3) case the transform targets)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    plain = ConvBNReLU(64, (7, 7), (2, 2), name="Conv2d_1a_7x7")
    s2d = SpaceToDepthStem(64, name="Conv2d_1a_7x7")
    variables = jax.jit(functools.partial(plain.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    v2 = jax.jit(functools.partial(s2d.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    # Identical parameter/stat trees -> checkpoints swap freely.
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, v2
    )

    out_plain = jax.jit(functools.partial(plain.apply, train=False))(
        variables, x
    )
    out_s2d = jax.jit(functools.partial(s2d.apply, train=False))(
        variables, x
    )
    assert out_plain.shape == out_s2d.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )


def test_backbone_logits_identical_with_s2d_stem():
    """Full backbone forward: flipping stem_space_to_depth with the SAME
    variables changes nothing numerically."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    base = InceptionV1Base(final_endpoint="Mixed_3b")
    variables = jax.jit(functools.partial(base.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    ref, _ = jax.jit(functools.partial(base.apply, train=False))(
        variables, x
    )
    alt = InceptionV1Base(final_endpoint="Mixed_3b", stem_space_to_depth=True)
    got, _ = jax.jit(functools.partial(alt.apply, train=False))(
        variables, x
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_s2d_gradients_match():
    """Training dynamics unchanged: grads wrt the (7,7,3,64) kernel agree."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    plain = ConvBNReLU(64, (7, 7), (2, 2), name="stem")
    s2d = SpaceToDepthStem(64, name="stem")
    variables = jax.jit(functools.partial(plain.init, train=False))(
        {"params": jax.random.key(3)}, x
    )

    def loss(mod, params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    g1 = jax.jit(jax.grad(functools.partial(loss, plain)))(
        variables["params"]
    )
    g2 = jax.jit(jax.grad(functools.partial(loss, s2d)))(
        variables["params"]
    )
    k1 = np.asarray(jax.tree.leaves(g1)[-1])
    k2 = np.asarray(jax.tree.leaves(g2)[-1])
    np.testing.assert_allclose(k2, k1, rtol=1e-4, atol=1e-4)
