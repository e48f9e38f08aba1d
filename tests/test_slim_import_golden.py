"""Golden roundtrip: a REAL TF checkpoint through the slim importer.

VERDICT r2 Next #4: `tools/import_slim_checkpoint.py` had only been tested
on name-mapping fixtures; the reference's standard workflow (warm-start
from the public slim ImageNet checkpoint, SURVEY.md C8) was unverified
against its actual on-disk format.  This test closes that:

1. writes a GENUINE slim-named checkpoint with `tf.compat.v1` variables +
   `Saver` (the same format family as the published inception_v1 ckpt),
2. reads it back through the importer's own `read_tf_checkpoint` +
   `convert_slim_vars`,
3. runs the full Inception-v1 forward + logits head on BOTH sides — ours
   in Flax (fp32, inference BN) and an INDEPENDENT TF-kernel graph
   (tf.nn.conv2d/batch_normalization/max_pool2d, TF-'SAME' semantics) —
   and asserts logits parity.

This pins checkpoint format, name mapping, kernel/BN layout conventions,
TF-'SAME' padding asymmetry, branch concat order, and the GAP+Logits head
in one assertion — the closest attainable proxy for the +-0.3 % warm-start
parity leg without network access to the real ImageNet ckpt.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvcnn_tf_tpu.models.backbones.inception_v1 import (
    _V1_PLAN,
    InceptionV1Base,
)
from gvcnn_tf_tpu.tools.import_slim_checkpoint import (
    convert_slim_vars,
    read_tf_checkpoint,
)

tf = pytest.importorskip("tensorflow")

NUM_CLASSES = 11
_BN_EPS = 0.001


def _slim_var_specs():
    """[(slim_name, shape)] for the full v1 backbone + logits head."""
    specs = []

    def conv_bn(scope, kh, kw, cin, cout):
        specs.append((f"{scope}/weights", (kh, kw, cin, cout)))
        for leaf in ("beta", "moving_mean", "moving_variance"):
            specs.append((f"{scope}/BatchNorm/{leaf}", (cout,)))

    c = 3
    for name, spec in _V1_PLAN:
        scope = f"InceptionV1/{name}"
        if spec[0] == "conv":
            _, feats, (kh, kw), _ = spec
            conv_bn(scope, kh, kw, c, feats)
            c = feats
        elif spec[0] == "mixed":
            _, b0, b1r, b1, b2r, b2, b3 = spec
            conv_bn(f"{scope}/Branch_0/Conv2d_0a_1x1", 1, 1, c, b0)
            conv_bn(f"{scope}/Branch_1/Conv2d_0a_1x1", 1, 1, c, b1r)
            conv_bn(f"{scope}/Branch_1/Conv2d_0b_3x3", 3, 3, b1r, b1)
            conv_bn(f"{scope}/Branch_2/Conv2d_0a_1x1", 1, 1, c, b2r)
            conv_bn(f"{scope}/Branch_2/Conv2d_0b_3x3", 3, 3, b2r, b2)
            conv_bn(f"{scope}/Branch_3/Conv2d_0b_1x1", 1, 1, c, b3)
            c = b0 + b1 + b2 + b3
    specs.append(("InceptionV1/Logits/Conv2d_0c_1x1/weights",
                  (1, 1, c, NUM_CLASSES)))
    specs.append(("InceptionV1/Logits/Conv2d_0c_1x1/biases", (NUM_CLASSES,)))
    return specs


def _write_real_ckpt(tmp_path):
    """Genuine tf.compat.v1 Saver checkpoint with slim names."""
    tf1 = tf.compat.v1
    rng = np.random.RandomState(0)
    values = {}
    graph = tf.Graph()
    with graph.as_default():
        for name, shape in _slim_var_specs():
            if name.endswith("moving_variance"):
                init = rng.rand(*shape).astype(np.float32) + 0.5
            elif name.endswith("weights"):
                init = (rng.randn(*shape) * 0.1).astype(np.float32)
            else:
                init = (rng.randn(*shape) * 0.1).astype(np.float32)
            values[name] = init
            tf1.get_variable(name, initializer=init)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            path = saver.save(sess, str(tmp_path / "inception_v1.ckpt"))
    return path, values


def _tf_forward(values, x_np):
    """Independent TF-kernel forward over the same plan (eager tf.nn)."""

    def cbr(x, scope, strides=1):
        x = tf.nn.conv2d(x, values[f"{scope}/weights"],
                         strides=[1, strides, strides, 1], padding="SAME")
        x = tf.nn.batch_normalization(
            x,
            values[f"{scope}/BatchNorm/moving_mean"],
            values[f"{scope}/BatchNorm/moving_variance"],
            values[f"{scope}/BatchNorm/beta"],
            None,
            _BN_EPS,
        )
        return tf.nn.relu(x)

    x = tf.constant(x_np)
    for name, spec in _V1_PLAN:
        scope = f"InceptionV1/{name}"
        if spec[0] == "conv":
            _, _, _, (sh, _) = spec
            x = cbr(x, scope, sh)
        elif spec[0] == "pool":
            _, (kh, kw), (sh, sw) = spec
            x = tf.nn.max_pool2d(x, (kh, kw), (sh, sw), padding="SAME")
        else:
            b0 = cbr(x, f"{scope}/Branch_0/Conv2d_0a_1x1")
            b1 = cbr(cbr(x, f"{scope}/Branch_1/Conv2d_0a_1x1"),
                     f"{scope}/Branch_1/Conv2d_0b_3x3")
            b2 = cbr(cbr(x, f"{scope}/Branch_2/Conv2d_0a_1x1"),
                     f"{scope}/Branch_2/Conv2d_0b_3x3")
            b3 = cbr(tf.nn.max_pool2d(x, (3, 3), (1, 1), padding="SAME"),
                     f"{scope}/Branch_3/Conv2d_0b_1x1")
            x = tf.concat([b0, b1, b2, b3], axis=-1)
    net = tf.reduce_mean(x, axis=(1, 2))
    w = tf.reshape(values["InceptionV1/Logits/Conv2d_0c_1x1/weights"],
                   (-1, NUM_CLASSES))
    logits = tf.matmul(net, w) + values[
        "InceptionV1/Logits/Conv2d_0c_1x1/biases"]
    return logits.numpy()


def _flax_forward(tree, x_np):
    model = InceptionV1Base(dtype=jnp.float32)
    variables = {
        "params": tree["params"]["InceptionV1"],
        "batch_stats": tree["batch_stats"]["InceptionV1"],
    }
    feats, _ = jax.jit(
        functools.partial(model.apply, train=False))(variables, x_np)
    net = jnp.mean(feats, axis=(1, 2))
    logits = net @ tree["params"]["Logits"]["kernel"] + (
        tree["params"]["Logits"]["bias"])
    return np.asarray(logits)


def test_real_tf_checkpoint_roundtrip_logits_parity(tmp_path):
    ckpt_path, values = _write_real_ckpt(tmp_path)

    slim_vars = read_tf_checkpoint(ckpt_path)
    # Saver wrote the exact variable set we created (format check).
    assert set(slim_vars) == set(values)
    for name, arr in slim_vars.items():
        np.testing.assert_array_equal(arr, values[name])

    tree = convert_slim_vars(slim_vars)
    assert tree["params"]["Logits"]["kernel"].shape == (1024, NUM_CLASSES)

    rng = np.random.RandomState(1)
    # 64x64 keeps the full 16-layer tower + every SAME-padding parity
    # transition while staying CPU-affordable; the net is fully conv.
    x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2.0) - 1.0

    ref = _tf_forward(values, x)
    got = _flax_forward(tree, x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
