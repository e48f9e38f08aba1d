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


def test_gradient_accumulation_matches_manual_microbatching():
    """accumulate_steps=2 must reproduce EXACTLY the manual emulation:
    per-microbatch grads (BN stats chained), averaged, then one optimizer
    step. (A full-batch comparison cannot be exact in fp32: BN's tiny
    init-time batch-sigma amplifies the backward's cancelling sums, so
    different-batch-shape XLA programs legitimately diverge numerically.)
    """
    import dataclasses

    import optax

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.train import create_train_state, make_train_step

    base = get_config("mn10_8view")
    cfg = base.replace(
        compute_dtype="float32",
        dropout_keep_prob=1.0,
        data=dataclasses.replace(
            base.data, height=32, width=32, num_views=2, batch_size=4,
        ),
        train=dataclasses.replace(
            base.train, optimizer="sgd", learning_rate=0.01,
        ),
    )
    rng = jax.random.key(0)
    model, tx, state0 = create_train_state(cfg, rng)

    views = jnp.asarray(
        np.random.RandomState(0).randn(4, 2, 32, 32, 3).astype(np.float32)
    )
    labels = jnp.asarray(np.array([3, 7, 1, 5], np.int32))
    batch = {"views": views, "label": labels}
    key = jax.random.key(1)

    cfg2 = cfg.replace(
        train=dataclasses.replace(cfg.train, accumulate_steps=2)
    )
    step2 = jax.jit(make_train_step(model, tx, cfg2))
    s2, m2 = step2(state0, batch, key)

    # Manual emulation of the scan (same microbatch programs).
    from gvcnn_tf_tpu.train import l2_regularization

    tc = cfg.train
    step_rng = jax.random.fold_in(key, state0.step)

    def loss_for(params, bn, v, l, r):
        (logits, _), upd = model.apply(
            {"params": params, "batch_stats": bn}, v, train=True,
            mutable=["batch_stats"], rngs={"dropout": r},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), l
        ).mean()
        return ce + l2_regularization(params, tc.weight_decay), (
            logits, upd["batch_stats"],
        )

    @jax.jit
    def manual(state, views, labels):
        bn = state.batch_stats
        gsum, lsum = None, 0.0
        for i in range(2):
            v, l = views[2 * i:2 * i + 2], labels[2 * i:2 * i + 2]
            (loss_i, (_, bn)), g_i = jax.value_and_grad(
                loss_for, has_aux=True
            )(state.params, bn, v, l, jax.random.fold_in(step_rng, i))
            gsum = g_i if gsum is None else jax.tree.map(
                jnp.add, gsum, g_i
            )
            lsum = lsum + loss_i
        grads = jax.tree.map(lambda g: g / 2.0, gsum)
        upd, opt = tx.update(grads, state.opt_state, state.params)
        return (
            optax.apply_updates(state.params, upd), bn, lsum / 2.0,
        )

    ref_params, ref_bn, ref_loss = manual(state0, views, labels)
    np.testing.assert_allclose(
        float(m2["loss"]), float(ref_loss), rtol=1e-6
    )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
        jax.tree_util.tree_flatten_with_path(s2.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=str(p),
        )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_bn)[0],
        jax.tree_util.tree_flatten_with_path(s2.batch_stats)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=str(p),
        )


def test_bf16_transfer_is_bit_identical():
    """Host-cast bf16 views == device-side fp32->bf16 convert, exactly
    (the claim behind transfer_dtype="auto"; round-to-nearest-even both
    ways).  Checked on a bf16-compute model: same loss, same grads."""
    cfg = tiny_config("mn10_8view").replace(compute_dtype="bfloat16")
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    batch32 = make_batch(cfg)
    batch16 = dict(batch32, views=batch32["views"].astype(jnp.bfloat16))
    key = jax.random.key(1)
    s32, m32 = step(state, batch32, key)
    s16, m16 = step(state, batch16, key)
    assert float(m32["loss"]) == float(m16["loss"])
    for a, b in zip(jax.tree.leaves(s32.params), jax.tree.leaves(s16.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
