"""Slim-checkpoint import: name mapping covers every backbone param
(SURVEY.md C8 — ImageNet warm-start parity without needing the real ckpt)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.models.backbones.inception_v1 import InceptionV1Base
from gvcnn_tf_tpu.tools.import_slim_checkpoint import (
    convert_slim_vars,
    slim_name_to_flax_path,
)


def test_name_mapping_examples():
    assert slim_name_to_flax_path("InceptionV1/Conv2d_1a_7x7/weights") == (
        "params", ("InceptionV1", "Conv2d_1a_7x7", "conv", "kernel"))
    assert slim_name_to_flax_path(
        "InceptionV1/Mixed_3b/Branch_1/Conv2d_0b_3x3/BatchNorm/beta"
    ) == ("params",
          ("InceptionV1", "Mixed_3b", "Branch_1_Conv2d_0b_3x3", "BatchNorm",
           "bias"))
    assert slim_name_to_flax_path(
        "InceptionV1/Conv2d_2b_1x1/BatchNorm/moving_variance"
    ) == ("batch_stats", ("InceptionV1", "Conv2d_2b_1x1", "BatchNorm", "var"))
    assert slim_name_to_flax_path("InceptionV1/Logits/Conv2d_0c_1x1/weights") == (
        "params", ("Logits", "kernel"))


def test_optimizer_slots_skipped():
    import pytest
    with pytest.raises(KeyError):
        slim_name_to_flax_path("InceptionV1/Conv2d_1a_7x7/weights/RMSProp")
    with pytest.raises(KeyError):
        slim_name_to_flax_path("global_step")


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_synthetic_slim_checkpoint_covers_backbone():
    """Build a fake slim var dict from OUR param tree's shapes via the
    inverse mapping, convert it, and check it fills the whole backbone."""
    model = InceptionV1Base()
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": jax.random.key(0)}, x,
    )

    # Inverse-map our tree to slim names.
    slim_vars = {}
    for path, leaf in _flatten({"InceptionV1": variables["params"]}):
        parts = list(path)
        if parts[-1] == "kernel" and parts[-2] == "conv":
            slim = "/".join(parts[:-2]) + "/weights"
        elif parts[-1] == "bias" and parts[-2] == "BatchNorm":
            slim = "/".join(parts[:-1]) + "/beta"
        else:
            continue
        slim = slim.replace("Branch_0_", "Branch_0/").replace(
            "Branch_1_", "Branch_1/").replace("Branch_2_", "Branch_2/").replace(
            "Branch_3_", "Branch_3/")
        slim_vars[slim] = np.zeros(leaf.shape, np.float32)
    for path, leaf in _flatten({"InceptionV1": variables["batch_stats"]}):
        parts = list(path)
        suffix = {"mean": "moving_mean", "var": "moving_variance"}[parts[-1]]
        slim = "/".join(parts[:-1]) + "/" + suffix
        slim = slim.replace("Branch_0_", "Branch_0/").replace(
            "Branch_1_", "Branch_1/").replace("Branch_2_", "Branch_2/").replace(
            "Branch_3_", "Branch_3/")
        slim_vars[slim] = np.zeros(leaf.shape, np.float32)

    tree = convert_slim_vars(slim_vars)

    # Converted tree must exactly cover our shapes (params: kernel+BN bias).
    want_params = {
        p: l.shape
        for p, l in _flatten({"InceptionV1": variables["params"]})
    }
    got_params = {p: l.shape for p, l in _flatten(tree["params"])}
    assert got_params == want_params
    want_bn = {
        p: l.shape
        for p, l in _flatten({"InceptionV1": variables["batch_stats"]})
    }
    got_bn = {p: l.shape for p, l in _flatten(tree["batch_stats"])}
    assert got_bn == want_bn


def test_logits_conv_squeezed():
    tree = convert_slim_vars({
        "InceptionV1/Logits/Conv2d_0c_1x1/weights":
            np.zeros((1, 1, 1024, 40), np.float32),
        "InceptionV1/Logits/Conv2d_0c_1x1/biases":
            np.zeros((40,), np.float32),
    })
    assert tree["params"]["Logits"]["kernel"].shape == (1024, 40)
    assert tree["params"]["Logits"]["bias"].shape == (40,)
