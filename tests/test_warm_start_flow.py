"""End-to-end warm-start: ImageNet-style backbone checkpoint -> train()
(reference slim assign_from_checkpoint_fn + checkpoint_exclude_scopes flow,
including the head-shape-differs case that motivates scope exclusion)."""

import dataclasses

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.data.synthetic import synthetic_dataset
from gvcnn_tf_tpu.models.gvcnn import init_model
from gvcnn_tf_tpu.train import train

# Full-model compiles / train loops: minutes each on a 1-core host.
pytestmark = pytest.mark.slow



def _small(cfg, logdir, ckpt_path="", num_classes=10):
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32, num_views=2,
            batch_size=2, synthetic_num_shapes=4, num_classes=num_classes,
        ),
        train=dataclasses.replace(
            cfg.train, num_steps=1, log_every=1, checkpoint_every=0,
            train_logdir=logdir, checkpoint_path=ckpt_path,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )


def test_warm_start_from_pretrained_with_different_head(tmp_path):
    # "Pretrained" model: same backbone, DIFFERENT head size (40 classes)
    # and differently-initialized GroupingModule — like an ImageNet ckpt.
    pre_cfg = _small(get_config("mn10_8view"), str(tmp_path / "x"),
                     num_classes=40)
    _, pre_vars = init_model(pre_cfg, jax.random.key(123),
                             input_shape=(2, 2, 32, 32, 3))
    pre_params = jax.tree.map(lambda x: np.asarray(x) + 1.0, pre_vars["params"])
    # Non-trivial BN moving stats, like a converted ImageNet checkpoint.
    pre_bn = jax.tree.map(lambda x: np.asarray(x) + 0.25,
                          pre_vars["batch_stats"])

    ckpt_dir = tmp_path / "pretrained"
    mgr = ocp.CheckpointManager(str(ckpt_dir),
                                options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(0, args=ocp.args.StandardSave(
        {"params": pre_params, "batch_stats": pre_bn}))
    mgr.wait_until_finished()
    mgr.close()

    # Train 1 step of the 10-class model warm-started from it.
    cfg = _small(get_config("mn10_8view"), str(tmp_path / "run"),
                 ckpt_path=str(ckpt_dir), num_classes=10)
    ds = synthetic_dataset(num_classes=10, num_views=2, height=32, width=32,
                           batch_size=2, num_shapes=4, seed=0)
    state, mets = train(cfg, dataset_iter=ds)
    assert np.isfinite(float(mets["loss"]))

    # Backbone was copied from the pretrained tree (then moved one SGD step
    # — compare against fresh init instead: warm-started values are the
    # shifted ones, far from the fresh init).
    _, fresh_vars = init_model(cfg, jax.random.key(cfg.train.seed),
                               input_shape=(2, 2, 32, 32, 3))
    pre_leaf = np.asarray(
        pre_params["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    got_leaf = np.asarray(
        state.params["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    fresh_leaf = np.asarray(
        fresh_vars["params"]["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    assert np.abs(got_leaf - pre_leaf).mean() < 0.1      # near pretrained
    assert np.abs(got_leaf - fresh_leaf).mean() > 0.5    # far from fresh

    # Excluded scopes (Logits 10 vs 40 classes) kept their fresh shapes.
    assert state.params["Logits"]["kernel"].shape[-1] == 10

    # BN moving statistics were warm-started too (ADVICE r1: slim's
    # assign_from_checkpoint_fn restores moving_mean/variance; without them
    # a 0.9997-decay run evals near chance).  One train step moved them only
    # slightly from the pretrained values, and far from the fresh init.
    got_bn = np.asarray(
        state.batch_stats["InceptionV1"]["Conv2d_1a_7x7"]["BatchNorm"]["mean"]
    )
    pre_bn_leaf = np.asarray(
        pre_bn["InceptionV1"]["Conv2d_1a_7x7"]["BatchNorm"]["mean"]
    )
    fresh_bn_leaf = np.asarray(
        fresh_vars["batch_stats"]["InceptionV1"]["Conv2d_1a_7x7"]["BatchNorm"]["mean"]
    )
    assert np.abs(got_bn - pre_bn_leaf).mean() < 0.05
    assert np.abs(got_bn - fresh_bn_leaf).mean() > 0.1


def test_warm_start_from_raw_standard_checkpoint(tmp_path):
    """A raw (step-less) StandardCheckpointer directory — the old
    import_slim_checkpoint output format — is consumable via the
    restore_partial fallback (ADVICE r1: this flow used to raise)."""
    pre_cfg = _small(get_config("mn10_8view"), str(tmp_path / "x"))
    _, pre_vars = init_model(pre_cfg, jax.random.key(9),
                             input_shape=(2, 2, 32, 32, 3))
    pre_params = jax.tree.map(lambda x: np.asarray(x) + 1.0,
                              pre_vars["params"])
    raw_dir = tmp_path / "raw_ckpt"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(raw_dir), {"params": pre_params})

    cfg = _small(get_config("mn10_8view"), str(tmp_path / "run_raw"),
                 ckpt_path=str(raw_dir))
    from gvcnn_tf_tpu.data.synthetic import synthetic_dataset as sd
    ds = sd(num_classes=10, num_views=2, height=32, width=32,
            batch_size=2, num_shapes=4, seed=0)
    state, mets = train(cfg, dataset_iter=ds)
    assert np.isfinite(float(mets["loss"]))
    got = np.asarray(
        state.params["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    pre = np.asarray(
        pre_params["InceptionV1"]["Conv2d_1a_7x7"]["conv"]["kernel"]
    )
    assert np.abs(got - pre).mean() < 0.1


def test_warm_start_missing_checkpoint_raises(tmp_path):
    cfg = _small(get_config("mn10_8view"), str(tmp_path / "run2"),
                 ckpt_path=str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError):
        train(cfg)
