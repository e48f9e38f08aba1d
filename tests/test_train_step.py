"""Train-step tests: single step sanity, overfit-8-samples, loss parts.

SURVEY.md section 4 "Integration": config-1 train-step smoke on CPU +
overfit sanity.  Uses tiny spatial sizes; everything jitted.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.train import (
    create_train_state,
    l2_regularization,
    make_lr_schedule,
    make_train_step,
)


def tiny_config(name="mn10_single_view", **train_kw):
    cfg = get_config(name)
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, height=32, width=32, batch_size=4, num_views=min(
                cfg.data.num_views, 4
            )
        ),
        train=dataclasses.replace(
            cfg.train, **{"learning_rate": 0.05, "weight_decay": 1e-4, **train_kw}
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    d = cfg.data
    shape = (
        (d.batch_size, d.num_views, d.height, d.width, 3)
        if cfg.multi_view
        else (d.batch_size, d.height, d.width, 3)
    )
    return {
        "views": jnp.asarray(rng.rand(*shape) * 2 - 1, jnp.float32),
        "label": jnp.asarray(rng.randint(0, d.num_classes, d.batch_size)),
    }


@pytest.mark.slow
def test_single_train_step_updates_state():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = make_batch(cfg)
    new_state, mets = step(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(mets["loss"]))
    assert float(mets["grad_norm"]) > 0
    # Params actually moved.
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    # BN stats moved too.
    bn_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.batch_stats, new_state.batch_stats,
    )
    assert max(jax.tree.leaves(bn_diff)) > 0


@pytest.mark.slow
def test_overfit_small_batch():
    """Overfit-8-samples sanity (SURVEY.md section 4): loss must drop
    substantially on a fixed batch."""
    cfg = tiny_config(optimizer="adam", learning_rate=1e-3, weight_decay=0.0)
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    batch = make_batch(cfg, seed=3)
    rng = jax.random.key(2)
    first = None
    for i in range(30):
        state, mets = step(state, batch, rng)
        if first is None:
            first = float(mets["loss"])
    last = float(mets["loss"])
    assert last < first * 0.5, (first, last)


@pytest.mark.slow
def test_multiview_train_step():
    cfg = tiny_config("mn10_8view")
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    _, mets = step(state, make_batch(cfg), jax.random.key(1))
    assert np.isfinite(float(mets["loss"]))


def test_l2_regularization_kernels_only():
    params = {
        "Conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "BatchNorm": {"scale": jnp.ones((4,)), "mean": jnp.ones((4,))},
    }
    reg = float(l2_regularization(params, 2.0))
    # 0.5 * wd * ||kernel||^2 = 0.5 * 2 * 4 = 4; bias/BN excluded.
    assert reg == pytest.approx(4.0)


def test_lr_schedule_exponential_staircase():
    cfg = tiny_config().train
    sched = make_lr_schedule(cfg)
    lr0 = float(sched(0))
    lr_mid = float(sched(cfg.lr_decay_steps - 1))
    lr_next = float(sched(cfg.lr_decay_steps))
    assert lr0 == pytest.approx(cfg.learning_rate)
    assert lr_mid == pytest.approx(cfg.learning_rate)   # staircase: flat
    assert lr_next == pytest.approx(cfg.learning_rate * cfg.lr_decay_rate)
