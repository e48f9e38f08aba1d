"""Raw-uint8 host transfer path (transfer_dtype='uint8').

The loader ships stored uint8 renders; normalization happens on device
(utils/images.py) with the same op sequence the host float path uses.
XLA may contract the scale constants (1 ulp of the input), so parity is
pinned at tight tolerances rather than bitwise; the host skips the float
conversion entirely.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config, resolve_transfer_dtype
from gvcnn_tf_tpu.data.pipeline import make_dataset
from gvcnn_tf_tpu.data.prefetch import _make_put
from gvcnn_tf_tpu.utils import normalize_views


def _tiny(transfer):
    cfg = get_config("mn10_8view")
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="procedural", height=32, width=32,
            num_views=2, batch_size=4, synthetic_num_shapes=8,
            transfer_dtype=transfer,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )


def test_normalize_views_uint8_matches_host_path():
    raw = np.arange(0, 256, dtype=np.uint8).reshape(1, 1, 16, 16, 1)
    raw = np.repeat(raw, 3, axis=-1)
    host = raw.astype(np.float32) / 255.0 * 2.0 - 1.0
    dev = np.asarray(normalize_views(jnp.asarray(raw)))
    np.testing.assert_array_equal(dev, host)          # bit-identical
    # float input passes through untouched (same object semantics)
    f = jnp.asarray(host)
    assert normalize_views(f) is f


def test_pipeline_yields_uint8_and_same_bytes():
    b8 = next(iter(make_dataset(_tiny("uint8").data, train=True, seed=0,
                                num_epochs=1)))
    bf = next(iter(make_dataset(_tiny("auto").data, train=True, seed=0,
                                num_epochs=1)))
    assert b8["views"].dtype == np.uint8
    assert bf["views"].dtype == np.float32
    np.testing.assert_array_equal(
        b8["views"].astype(np.float32) / 255.0 * 2.0 - 1.0, bf["views"])
    np.testing.assert_array_equal(b8["label"], bf["label"])


def test_train_step_matches_float_transfer():
    from gvcnn_tf_tpu.train import create_train_state, make_train_step

    cfg8, cfgf = _tiny("uint8"), _tiny("auto")
    model, tx, state0 = create_train_state(cfg8, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg8))
    b8 = next(iter(make_dataset(cfg8.data, train=True, seed=0, num_epochs=1)))
    bf = next(iter(make_dataset(cfgf.data, train=True, seed=0, num_epochs=1)))
    s1, m1 = step(state0, {"views": jnp.asarray(b8["views"]),
                           "label": jnp.asarray(b8["label"])},
                  jax.random.key(1))
    s2, m2 = step(state0, {"views": jnp.asarray(bf["views"]),
                           "label": jnp.asarray(bf["label"])},
                  jax.random.key(1))
    # Not bit-identical: XLA may contract /255*2 into one constant multiply
    # (1 ulp of the input); anything beyond these tolerances is a real bug.
    # (Post-optimizer params are NOT compared: Adam's step-1 update divides
    # by sqrt(v) of the same tiny gradients, amplifying ulp noise ~100x.)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-3)
    assert float(m1["accuracy"]) == float(m2["accuracy"])
    assert s1.step == s2.step == 1


def test_resolve_transfer_dtype_uint8_means_no_prefetch_cast():
    assert resolve_transfer_dtype(_tiny("uint8")) is None


def test_prefetch_rejects_integer_cast_target():
    with pytest.raises(ValueError, match="float dtype"):
        _make_put(None, "uint8")


def test_uint8_requires_supporting_loader():
    cfg = _tiny("uint8")
    bad = cfg.replace(data=dataclasses.replace(cfg.data,
                                               dataset="synthetic"))
    with pytest.raises(ValueError, match="uint8"):
        make_dataset(bad.data, train=True, seed=0, num_epochs=1)


def test_eval_matches_across_transfer_dtypes():
    from gvcnn_tf_tpu.eval import evaluate
    from gvcnn_tf_tpu.train import create_train_state

    cfg8, cfgf = _tiny("uint8"), _tiny("auto")
    _, _, state = create_train_state(cfg8, jax.random.key(2))
    r8 = evaluate(cfg8, state=state)
    rf = evaluate(cfgf, state=state)
    assert r8["count"] == rf["count"]
    # 1-ulp input differences can flip an argmax only on exact logit ties;
    # allow at most one flipped prediction.
    assert abs(r8["correct"] - rf["correct"]) <= 1
