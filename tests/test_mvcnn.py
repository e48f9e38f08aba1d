"""MVCNN baseline model family tests."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.models.gvcnn import init_model


def _cfg():
    cfg = get_config("mn40_12view_mvcnn")
    return cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=3,
                                 batch_size=2, num_classes=5),
        compute_dtype="float32",
    )


def test_mvcnn_forward_and_exact_view_permutation_invariance():
    cfg = _cfg()
    model, variables = init_model(cfg, jax.random.key(0),
                                  input_shape=(2, 3, 32, 32, 3))
    apply_eval = jax.jit(functools.partial(model.apply, train=False))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32, 3), jnp.float32)
    logits, ep = apply_eval(variables, x)
    assert logits.shape == (2, 5)
    assert ep["shape_descriptor"].shape == (2, 1024)
    assert "group_scheme" not in ep      # no grouping module in MVCNN

    # max over views is EXACTLY permutation invariant (same device math).
    logits_p, _ = apply_eval(variables, x[:, [2, 0, 1]])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_p),
                               rtol=1e-5, atol=1e-6)


def test_mvcnn_trains():
    from gvcnn_tf_tpu.train import create_train_state, make_train_step

    cfg = _cfg()
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    rng = np.random.RandomState(1)
    batch = {
        "views": jnp.asarray(rng.rand(2, 3, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 5, 2)),
    }
    new_state, mets = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(mets["loss"]))
    assert int(new_state.step) == 1
