"""Pallas stem kernel (ops/pallas_stem.py): interpret-mode parity with the
XLA conv lowering it replaces, weight packing correctness, VJP parity, and
module/param-tree compatibility."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.ops.pallas_stem import (
    _pack_weights,
    _stem_fwd,
    stem_conv,
    stem_conv_reference,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


@pytest.mark.parametrize("h,w", [(32, 32), (64, 32)])
def test_interpret_matches_xla_conv(h, w):
    x = _rand((2, h, w, 3), 0)
    k = _rand((7, 7, 3, 64), 1, 0.1)
    ref = stem_conv_reference(x, k)
    got = _stem_fwd(x, k, interpret=True)
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,  # bf16 accumulation-order differences
    )


def test_pack_weights_layout():
    k = _rand((7, 7, 3, 64), 2, 0.1).astype(jnp.bfloat16)
    b = np.asarray(_pack_weights(k), np.float32).reshape(9, 24, 128)
    kn = np.asarray(k, np.float32)
    # even-row block: b[di, 3*dj+ch, c] == k[di, dj, ch, c]
    np.testing.assert_array_equal(
        b[0:7, :21, 0:64], kn.reshape(7, 21, 64)
    )
    # odd-row block shifted down by 2 input rows
    np.testing.assert_array_equal(
        b[2:9, :21, 64:128], kn.reshape(7, 21, 64)
    )
    # zero padding everywhere else
    assert np.all(b[7:9, :, 0:64] == 0)
    assert np.all(b[0:2, :, 64:128] == 0)
    assert np.all(b[:, 21:, :] == 0)


def test_vjp_matches_reference_conv():
    """The custom VJP delegates to XLA's conv pullback: grads wrt the
    kernel must match the reference conv's grads exactly."""
    x = _rand((2, 16, 16, 3), 3)
    k = _rand((7, 7, 3, 64), 4, 0.1)

    def loss_ref(kk):
        return jnp.sum(stem_conv_reference(x, kk).astype(jnp.float32) ** 2)

    import gvcnn_tf_tpu.ops.pallas_stem as ps

    # Forward via the (interpret-mode) kernel; backward exactly as
    # stem_conv's registered bwd rule computes it.
    y = ps._stem_fwd(x, k, interpret=True)
    g = (2.0 * y.astype(jnp.float32))
    _, g_pal = ps._stem_conv_bwd((x, k), g)

    g_ref = jax.grad(loss_ref)(k)
    np.testing.assert_allclose(
        np.asarray(g_pal, np.float32), np.asarray(g_ref, np.float32),
        rtol=0.1, atol=0.5,
    )


def test_module_param_tree_matches_plain_stem():
    """PallasStem declares the exact ConvBNReLU tree, so checkpoints swap."""
    from gvcnn_tf_tpu.models.backbones.inception_v1 import (
        ConvBNReLU,
        PallasStem,
    )

    x = _rand((1, 16, 16, 3), 5)
    plain = ConvBNReLU(64, (7, 7), (2, 2), name="Conv2d_1a_7x7")
    variables = jax.jit(functools.partial(plain.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    pal = PallasStem(64, 3, name="Conv2d_1a_7x7")
    v2 = jax.eval_shape(
        functools.partial(pal.init, train=False),
        {"params": jax.random.key(0)}, x,
    )
    assert jax.tree.map(lambda a: tuple(a.shape), variables) == jax.tree.map(
        lambda a: tuple(a.shape), v2
    )


def test_h_mod_4_eq_2_rejected():
    """The kernel emits output rows in PAIRS; h % 4 == 2 (e.g. 30) would
    pass an h%2 gate yet leave the final output row as uninitialized VMEM
    garbage (ADVICE r2).  The shape gate must reject it loudly."""
    x = _rand((1, 30, 16, 3), 7)
    k = _rand((7, 7, 3, 64), 8)
    with pytest.raises(AssertionError):
        _stem_fwd(x, k, interpret=True)
