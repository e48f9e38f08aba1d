"""Config/flag-system tests (reference tf.app.flags parity, SURVEY.md §5)."""

import pytest

from gvcnn_tf_tpu.configs import (
    CONFIGS, add_flags, config_from_flags, get_config,
)
import argparse


def parse(argv):
    p = argparse.ArgumentParser()
    add_flags(p)
    return config_from_flags(p.parse_args(argv))


def test_all_named_configs_construct():
    for name in CONFIGS:
        cfg = get_config(name)
        assert cfg.name == name


def test_reference_flag_aliases_map():
    cfg = parse([
        "--config", "mn40_12view",
        "--num_views", "8", "--num_group", "4", "--num_classes", "10",
        "--batch_size", "16", "--learning_rate", "0.02",
        "--how_many_training_steps", "77", "--optimizer", "adam",
        "--dataset_dir", "/data/x", "--train_logdir", "/tmp/y",
        "--checkpoint_exclude_scopes", "Logits,GroupingModule",
        "--backbone", "resnet50", "--model", "mvcnn",
        "--bn_momentum", "0.9", "--seed", "3",
    ])
    assert cfg.data.num_views == 8
    assert cfg.num_group == 4
    assert cfg.data.num_classes == 10
    assert cfg.data.batch_size == 16
    assert cfg.train.learning_rate == 0.02
    assert cfg.train.num_steps == 77
    assert cfg.train.optimizer == "adam"
    assert cfg.data.dataset_dir == "/data/x"
    assert cfg.train.train_logdir == "/tmp/y"
    assert cfg.train.checkpoint_exclude_scopes == ("Logits", "GroupingModule")
    assert cfg.backbone == "resnet50"
    assert cfg.model == "mvcnn"
    assert cfg.bn_momentum == 0.9
    assert cfg.train.seed == 3


def test_defaults_untouched_without_flags():
    cfg = parse(["--config", "mn10_8view"])
    base = get_config("mn10_8view")
    assert cfg == base


def test_unknown_config_rejected():
    with pytest.raises(KeyError, match="unknown config"):
        parse(["--config", "nope"])


def test_tpu_compiler_options_off_tpu_and_override(monkeypatch):
    """tpu_compiler_options: None off-TPU (CPU suite) so jit accepts it;
    env override respected."""
    from gvcnn_tf_tpu.utils import tpu_compiler_options

    assert tpu_compiler_options() is None  # suite runs on CPU
    monkeypatch.setenv("GVCNN_SCOPED_VMEM_KIB", "12345")
    assert tpu_compiler_options() is None  # still CPU — backend gates first


def test_resolve_transfer_dtype_auto():
    """auto -> bf16 exactly for bf16-compute configs; explicit wins."""
    import dataclasses

    from gvcnn_tf_tpu.configs import get_config, resolve_transfer_dtype

    cfg = get_config("mn40_12view")  # bf16 compute
    assert cfg.data.transfer_dtype == "auto"
    assert resolve_transfer_dtype(cfg) == "bfloat16"
    f32 = cfg.replace(compute_dtype="float32")
    assert resolve_transfer_dtype(f32) is None
    pinned = cfg.replace(
        data=dataclasses.replace(cfg.data, transfer_dtype="float32"))
    assert resolve_transfer_dtype(pinned) is None
    pinned16 = f32.replace(
        data=dataclasses.replace(f32.data, transfer_dtype="bfloat16"))
    assert resolve_transfer_dtype(pinned16) == "bfloat16"
