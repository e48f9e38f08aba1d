"""Checkpoint/resume + warm-start tests (SURVEY.md C8 parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.checkpoint import Checkpointer, warm_start
from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.train import TrainState, create_train_state


def tiny_cfg():
    cfg = get_config("mn10_single_view")
    return cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, batch_size=2),
        compute_dtype="float32",
    )


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_cfg()
    _, _, state = create_train_state(cfg, jax.random.key(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(7, jax.device_get(state))
    ckpt.wait()
    assert ckpt.latest_step() == 7

    _, _, fresh = create_train_state(cfg, jax.random.key(1))
    restored = ckpt.restore(jax.device_get(fresh))
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    ckpt.close()


def test_restore_raises_when_empty(tmp_path):
    cfg = tiny_cfg()
    _, _, state = create_train_state(cfg, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(jax.device_get(state))


def test_warm_start_excludes_scopes():
    init = {
        "Backbone": {"kernel": jnp.zeros((2, 2))},
        "Logits": {"kernel": jnp.zeros((3,))},
        "GroupingModule": {"kernel": jnp.zeros((4,))},
    }
    pretrained = {
        "Backbone": {"kernel": jnp.ones((2, 2))},
        "Logits": {"kernel": jnp.ones((3,))},
        "GroupingModule": {"kernel": jnp.ones((4,))},
    }
    out = warm_start(init, pretrained,
                     exclude_scopes=("Logits", "GroupingModule"))
    assert float(out["Backbone"]["kernel"].sum()) == 4.0   # copied
    assert float(out["Logits"]["kernel"].sum()) == 0.0     # excluded
    assert float(out["GroupingModule"]["kernel"].sum()) == 0.0


def test_warm_start_shape_mismatch_raises():
    init = {"Backbone": {"kernel": jnp.zeros((2, 2))}}
    pretrained = {"Backbone": {"kernel": jnp.ones((3, 3))}}
    with pytest.raises(ValueError, match="shape mismatch"):
        warm_start(init, pretrained)
