"""Cross-cutting semantic invariants."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.ops import grouping as G


def test_single_group_equals_global_max_pool():
    """GVCNN with M=1 degenerates to MVCNN: one group holds every view,
    its weight is 1, and the fused descriptor is the element-wise max over
    all views."""
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.uniform(0.01, 0.99, (3, 8)).astype(np.float32))
    descs = jnp.asarray(rng.randn(3, 8, 32).astype(np.float32))
    fused, weights, scheme = G.group_and_fuse(scores, descs, 1)
    np.testing.assert_allclose(np.asarray(weights), 1.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(scheme), 1.0)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(descs.max(axis=1)), rtol=1e-6
    )


def test_train_step_deterministic_across_processes():
    """Same seed -> identical first-step loss and params (RNG plumbing:
    init key from config seed, dropout key folded with the step)."""
    from gvcnn_tf_tpu.train import create_train_state, make_train_step

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="float32", use_pallas_grouping=False,
    )
    rng = np.random.RandomState(7)
    batch = {
        "views": jnp.asarray(rng.rand(2, 2, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 10, 2)),
    }

    losses, leaves = [], []
    for _ in range(2):
        model, tx, state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(model, tx, cfg))
        new_state, mets = step(state, batch, jax.random.key(1))
        losses.append(float(mets["loss"]))
        leaves.append(np.asarray(jax.tree.leaves(new_state.params)[0]))
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(leaves[0], leaves[1])


def test_eval_forward_has_no_dropout_randomness():
    """train=False must be rng-free and deterministic."""
    from gvcnn_tf_tpu.models.gvcnn import init_model

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="float32", use_pallas_grouping=False,
    )
    model, variables = init_model(cfg, jax.random.key(0),
                                  input_shape=(2, 2, 32, 32, 3))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 2, 32, 32, 3),
                    jnp.float32)
    f = jax.jit(functools.partial(model.apply, train=False))
    a, _ = f(variables, x)
    b, _ = f(variables, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
