"""Custom max-pool VJP (impl="equality") vs XLA's select-and-scatter lowering.

The backbone pools (SURVEY.md Appendix A: MaxPool_2a/3a/4a 3x3/2,
MaxPool_5a 2x2/2, Branch_3 3x3/1) route through
`gvcnn_tf_tpu.ops.pool.max_pool`.  The opt-in impl="equality" backward
replaces select-and-scatter with a two-phase equality-mask formulation
(kept as a measured negative result — see the max_pool docstring).  These
tests pin its contract: identical forward, identical gradient INCLUDING tie semantics
(first max in row-major window order — ReLU activations tie at 0 all the
time, so this is not a measure-zero concern).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.ops.pool import max_pool

# (shape, kernel, strides, padding): every geometry the backbones use, plus
# odd sizes that exercise asymmetric SAME pads and VALID leftover tails.
CASES = [
    ((2, 16, 16, 8), (3, 3), (2, 2), "SAME"),   # MaxPool_2a/3a/4a geometry
    ((2, 14, 14, 8), (2, 2), (2, 2), "SAME"),   # MaxPool_5a
    ((2, 9, 9, 8), (3, 3), (1, 1), "SAME"),     # Mixed Branch_3
    ((2, 15, 15, 8), (3, 3), (2, 2), "VALID"),  # v3/v4 reduction pools
    ((1, 5, 9, 2), (3, 3), (2, 2), "SAME"),     # odd H/W, asymmetric pads
    ((1, 10, 10, 3), (3, 3), (2, 2), "VALID"),  # VALID with uncovered tail
]


def _tie_heavy(key, shape):
    """Quantized + ReLU'd values: many exact ties, many zeros."""
    x = jax.random.normal(key, shape)
    return jnp.maximum(jnp.round(x * 2) / 2, 0.0)


@pytest.mark.parametrize("shape,kernel,strides,padding", CASES)
def test_forward_matches_flax(shape, kernel, strides, padding):
    x = _tie_heavy(jax.random.PRNGKey(0), shape)
    ref = nn.max_pool(x, kernel, strides=strides, padding=padding)
    got = max_pool(x, kernel, strides, padding=padding, impl="equality")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("shape,kernel,strides,padding", CASES)
def test_gradient_matches_select_and_scatter(shape, kernel, strides, padding):
    key = jax.random.PRNGKey(1)
    x = _tie_heavy(key, shape)
    out_shape = nn.max_pool(x, kernel, strides=strides, padding=padding).shape
    g = jax.random.normal(jax.random.PRNGKey(2), out_shape)

    ref = jax.grad(
        lambda x: (nn.max_pool(x, kernel, strides=strides,
                               padding=padding) * g).sum())(x)
    got = jax.grad(
        lambda x: (max_pool(x, kernel, strides, padding=padding, impl="equality") * g).sum())(x)
    # Same credited positions and values; tiny fp32 diffs only where several
    # overlapping windows sum into one position in different order.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)
    # Tie routing must be IDENTICAL: nonzero pattern match, exactly.
    np.testing.assert_array_equal(np.asarray(ref) != 0, np.asarray(got) != 0)


def test_all_equal_window_credits_first_element():
    """Every window all-zero: whole cotangent goes to window element (0,0)."""
    x = jnp.zeros((1, 4, 4, 1))
    g = jax.grad(lambda x: max_pool(x, (3, 3), (2, 2), impl="equality").sum())(x)
    expected = np.zeros((4, 4))
    expected[0, 0] = expected[0, 2] = expected[2, 0] = expected[2, 2] = 1.0
    np.testing.assert_array_equal(np.asarray(g)[0, :, :, 0], expected)


def test_bf16_roundtrip():
    x = _tie_heavy(jax.random.PRNGKey(3), (2, 8, 8, 4)).astype(jnp.bfloat16)
    ref = jax.grad(lambda x: nn.max_pool(
        x, (3, 3), strides=(2, 2), padding="SAME").astype(jnp.float32).sum())(x)
    got = jax.grad(lambda x: max_pool(
        x, (3, 3), (2, 2), impl="equality").astype(jnp.float32).sum())(x)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))
    assert got.dtype == jnp.bfloat16


def test_value_and_grad_under_jit_and_vmap():
    x = _tie_heavy(jax.random.PRNGKey(4), (3, 2, 9, 9, 4))
    f = jax.jit(jax.vmap(
        lambda x: max_pool(x, (3, 3), (1, 1), impl="equality").sum()))
    r = jax.jit(jax.vmap(
        lambda x: nn.max_pool(x, (3, 3), strides=(1, 1),
                              padding="SAME").sum()))
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(r(x)), rtol=1e-6)
