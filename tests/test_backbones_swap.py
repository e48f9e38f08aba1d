"""Backbone-swap tests (BASELINE config 4): Inception-v4 and ResNet-50
behind the same endpoint interface as Inception-v1."""

import functools

import jax
import jax.numpy as jnp
import pytest

from gvcnn_tf_tpu.models.backbones import get_backbone


def shapes_of(name, hw, final_endpoint=None):
    cls = get_backbone(name)
    kw = {"final_endpoint": final_endpoint} if final_endpoint else {}
    model = cls(**kw)
    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), {"params": jax.random.key(0)}, x
    )
    feats, endpoints = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    return model, feats, endpoints


def test_inception_v4_shapes_299():
    _, feats, ep = shapes_of("inception_v4", 299)
    # Canonical slim inception_v4 tower shapes.
    assert ep["Mixed_3a"].shape == (1, 73, 73, 160)
    assert ep["Mixed_4a"].shape == (1, 71, 71, 192)
    assert ep["Mixed_5a"].shape == (1, 35, 35, 384)
    assert ep["Mixed_5e"].shape == (1, 35, 35, 384)
    assert ep["Mixed_6a"].shape == (1, 17, 17, 1024)
    assert ep["Mixed_6h"].shape == (1, 17, 17, 1024)
    assert ep["Mixed_7a"].shape == (1, 8, 8, 1536)
    assert feats.shape == (1, 8, 8, 1536)


def test_inception_v4_runs_at_224():
    _, feats, _ = shapes_of("inception_v4", 224)
    assert feats.shape[-1] == 1536      # fully convolutional at 224 too


def test_resnet50_shapes_224():
    _, feats, ep = shapes_of("resnet50", 224)
    # slim resnet_v1 endpoint geometry: block stride at the LAST unit, so
    # block1 is already 28x28 (torchvision would report 56x56 here).
    assert ep["conv1"].shape == (1, 56, 56, 64)
    assert ep["block1"].shape == (1, 28, 28, 256)
    assert ep["block2"].shape == (1, 14, 14, 512)
    assert ep["block3"].shape == (1, 7, 7, 1024)
    assert ep["block4"].shape == (1, 7, 7, 2048)
    assert feats.shape == (1, 7, 7, 2048)


def test_truncation_swapped_backbones():
    _, feats, ep = shapes_of("inception_v4", 224, final_endpoint="Mixed_5e")
    assert "Mixed_6a" not in ep
    _, feats, ep = shapes_of("resnet50", 224, final_endpoint="block2")
    assert "block3" not in ep
    assert feats.shape[-1] == 512


@pytest.mark.parametrize("name", ["inception_v4", "resnet50"])
def test_gvcnn_with_swapped_backbone(name):
    """GVCNN assembly works with swapped backbones (shape-level)."""
    import dataclasses
    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.models import build_model

    cfg = get_config(f"mn40_12view_{name}")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=128, width=128,
                                 batch_size=1, num_views=2),
        compute_dtype="float32", use_pallas_grouping=False,
    )
    model = build_model(cfg)
    x = jax.ShapeDtypeStruct((1, 2, 128, 128, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), {"params": jax.random.key(0)}, x
    )
    (logits, ep) = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    assert logits.shape == (1, 40)
    dim = get_backbone(cfg.backbone).DESCRIPTOR_DIM
    assert ep["shape_descriptor"].shape == (1, dim)


def test_real_forward_resnet_small():
    """One real (non-eval_shape) forward through ResNet-50 at tiny size."""
    cls = get_backbone("resnet50")
    model = cls(final_endpoint="block1")
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    feats, _ = jax.jit(functools.partial(model.apply, train=False))(variables, x)
    assert feats.shape == (1, 4, 4, 256)   # block1 strides at its last unit


def test_inception_v2_shapes_224():
    _, feats, ep = shapes_of("inception_v2", 224)
    # Canonical slim inception_v2 tower shapes.
    assert ep["Conv2d_1a_7x7"].shape == (1, 112, 112, 64)
    assert ep["MaxPool_3a_3x3"].shape == (1, 28, 28, 192)
    assert ep["Mixed_3b"].shape == (1, 28, 28, 256)
    assert ep["Mixed_3c"].shape == (1, 28, 28, 320)
    assert ep["Mixed_4a"].shape == (1, 14, 14, 576)
    assert ep["Mixed_4e"].shape == (1, 14, 14, 576)
    assert ep["Mixed_5a"].shape == (1, 7, 7, 1024)
    assert ep["Mixed_5c"].shape == (1, 7, 7, 1024)
    assert feats.shape == (1, 7, 7, 1024)


def test_gvcnn_with_inception_v2():
    import dataclasses
    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.models import build_model

    cfg = get_config("mn40_12view").replace(backbone="inception_v2")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=128, width=128,
                                 batch_size=1, num_views=2),
        compute_dtype="float32", use_pallas_grouping=False,
    )
    model = build_model(cfg)
    x = jax.ShapeDtypeStruct((1, 2, 128, 128, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), {"params": jax.random.key(0)}, x
    )
    logits, ep = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    assert logits.shape == (1, 40)
    assert ep["shape_descriptor"].shape == (1, 1024)


def test_inception_v3_shapes_299():
    _, feats, ep = shapes_of("inception_v3", 299)
    # Canonical slim inception_v3 tower shapes.
    assert ep["Conv2d_1a_3x3"].shape == (1, 149, 149, 32)
    assert ep["MaxPool_5a_3x3"].shape == (1, 35, 35, 192)
    assert ep["Mixed_5b"].shape == (1, 35, 35, 256)
    assert ep["Mixed_5d"].shape == (1, 35, 35, 288)
    assert ep["Mixed_6a"].shape == (1, 17, 17, 768)
    assert ep["Mixed_6e"].shape == (1, 17, 17, 768)
    assert ep["Mixed_7a"].shape == (1, 8, 8, 1280)
    assert feats.shape == (1, 8, 8, 2048)


def test_gvcnn_with_inception_v3():
    import dataclasses
    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.models import build_model
    import jax, jax.numpy as jnp, functools

    cfg = get_config("mn40_12view").replace(
        backbone="inception_v3", raw_endpoint="Mixed_5d",
        final_endpoint="Mixed_7c",
    )
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=160, width=160,
                                 batch_size=1, num_views=2),
        compute_dtype="float32", use_pallas_grouping=False,
    )
    model = build_model(cfg)
    x = jax.ShapeDtypeStruct((1, 2, 160, 160, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), {"params": jax.random.key(0)}, x
    )
    logits, ep = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    assert logits.shape == (1, 40)
    assert ep["shape_descriptor"].shape == (1, 2048)
