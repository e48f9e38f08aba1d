"""Inception-v2 backbone in Flax, slim-compatible (SURVEY.md C6 [MED]:
"likely v2/v3/v4" among the reference's vendored slim nets).

Re-implements the behavior of TF-Slim `nets/inception_v2.py`: same endpoint
names and channel plan, the depthwise-separable 7x7 stem (depth_multiplier
8), BN-everywhere arg-scope, and the v2 Mixed block family —
  normal block:   1x1 | 1x1->3x3 | 1x1->3x3->3x3 | pool->1x1
  stride-2 block: 1x1->3x3/2 | 1x1->3x3->3x3/2 | maxpool/2  (no 1x1 branch)

Endpoint spec (224x224 input):
  Conv2d_1a_7x7 112x112x64 ... Mixed_3b 28x28x256, Mixed_3c 28x28x320,
  Mixed_4a 14x14x576 ... Mixed_5a 7x7x1024, Mixed_5c 7x7x1024.

TPU-first notes identical to inception_v1.py: dtype-polymorphic convs/BN
(bfloat16 compute, fp32 params/stats), view axis folded by the caller.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gvcnn_tf_tpu.ops.pool import max_pool

from gvcnn_tf_tpu.models.backbones.inception_v1 import ConvBNReLU, _conv_init


class SeparableConvBNReLU(nn.Module):
    """slim.separable_conv2d + BN + relu (the v2 stem: depthwise 7x7 with
    depth_multiplier, then pointwise projection)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    depth_multiplier: int = 8
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch * self.depth_multiplier,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=in_ch,       # depthwise
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init(),
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=_conv_init(), name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=0.001, dtype=self.dtype, param_dtype=jnp.float32,
            use_scale=False, name="BatchNorm",
        )(x)
        return nn.relu(x)


class InceptionV2Block(nn.Module):
    """Normal v2 Mixed block: 1x1 | 1x1->3x3 | 1x1->double 3x3 | pool->1x1."""

    b0: int
    b1_reduce: int
    b1: int
    b2_reduce: int
    b2: int
    b3: int
    pool: str = "avg"                  # avg | max (Mixed_5c uses max)
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, m = self.dtype, self.bn_momentum
        br0 = ConvBNReLU(self.b0, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_0_Conv2d_0a_1x1")(x, train)
        br1 = ConvBNReLU(self.b1_reduce, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_1_Conv2d_0a_1x1")(x, train)
        br1 = ConvBNReLU(self.b1, (3, 3), dtype=d, bn_momentum=m,
                         name="Branch_1_Conv2d_0b_3x3")(br1, train)
        br2 = ConvBNReLU(self.b2_reduce, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_2_Conv2d_0a_1x1")(x, train)
        br2 = ConvBNReLU(self.b2, (3, 3), dtype=d, bn_momentum=m,
                         name="Branch_2_Conv2d_0b_3x3")(br2, train)
        br2 = ConvBNReLU(self.b2, (3, 3), dtype=d, bn_momentum=m,
                         name="Branch_2_Conv2d_0c_3x3")(br2, train)
        if self.pool == "avg":
            br3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            br3 = max_pool(x, (3, 3), (1, 1), padding="SAME")
        br3 = ConvBNReLU(self.b3, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_3_Conv2d_0b_1x1")(br3, train)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class InceptionV2ReduceBlock(nn.Module):
    """Stride-2 v2 block (Mixed_4a / Mixed_5a): two conv towers + maxpool."""

    b0_reduce: int
    b0: int
    b1_reduce: int
    b1: int
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, m = self.dtype, self.bn_momentum
        br0 = ConvBNReLU(self.b0_reduce, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_0_Conv2d_0a_1x1")(x, train)
        br0 = ConvBNReLU(self.b0, (3, 3), (2, 2), dtype=d, bn_momentum=m,
                         name="Branch_0_Conv2d_1a_3x3")(br0, train)
        br1 = ConvBNReLU(self.b1_reduce, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_1_Conv2d_0a_1x1")(x, train)
        br1 = ConvBNReLU(self.b1, (3, 3), dtype=d, bn_momentum=m,
                         name="Branch_1_Conv2d_0b_3x3")(br1, train)
        br1 = ConvBNReLU(self.b1, (3, 3), (2, 2), dtype=d, bn_momentum=m,
                         name="Branch_1_Conv2d_1a_3x3")(br1, train)
        br2 = max_pool(x, (3, 3), (2, 2), padding="SAME")
        return jnp.concatenate([br0, br1, br2], axis=-1)


# (endpoint, spec).  Specs: ("sep", feats, kernel, stride) |
# ("conv", feats, kernel, stride) | ("pool", kernel, stride) |
# ("mixed", b0, b1r, b1, b2r, b2, b3, pool) | ("reduce", b0r, b0, b1r, b1).
# Channel plan: slim nets/inception_v2.py [MED].
_V2_PLAN: Sequence[Tuple[str, Tuple]] = (
    ("Conv2d_1a_7x7", ("sep", 64, (7, 7), (2, 2))),
    ("MaxPool_2a_3x3", ("pool", (3, 3), (2, 2))),
    ("Conv2d_2b_1x1", ("conv", 64, (1, 1), (1, 1))),
    ("Conv2d_2c_3x3", ("conv", 192, (3, 3), (1, 1))),
    ("MaxPool_3a_3x3", ("pool", (3, 3), (2, 2))),
    ("Mixed_3b", ("mixed", 64, 64, 64, 64, 96, 32, "avg")),
    ("Mixed_3c", ("mixed", 64, 64, 96, 64, 96, 64, "avg")),
    ("Mixed_4a", ("reduce", 128, 160, 64, 96)),
    ("Mixed_4b", ("mixed", 224, 64, 96, 96, 128, 128, "avg")),
    ("Mixed_4c", ("mixed", 192, 96, 128, 96, 128, 128, "avg")),
    ("Mixed_4d", ("mixed", 160, 128, 160, 128, 160, 96, "avg")),
    ("Mixed_4e", ("mixed", 96, 128, 192, 160, 192, 96, "avg")),
    ("Mixed_5a", ("reduce", 128, 192, 192, 256)),
    ("Mixed_5b", ("mixed", 352, 192, 320, 160, 224, 128, "avg")),
    ("Mixed_5c", ("mixed", 352, 192, 320, 192, 224, 128, "max")),
)

ENDPOINTS = tuple(name for name, _ in _V2_PLAN)

ENDPOINT_CHANNELS = {
    "Conv2d_1a_7x7": 64, "MaxPool_2a_3x3": 64, "Conv2d_2b_1x1": 64,
    "Conv2d_2c_3x3": 192, "MaxPool_3a_3x3": 192, "Mixed_3b": 256,
    "Mixed_3c": 320, "Mixed_4a": 576, "Mixed_4b": 576, "Mixed_4c": 576,
    "Mixed_4d": 576, "Mixed_4e": 576, "Mixed_5a": 1024, "Mixed_5b": 1024,
    "Mixed_5c": 1024,
}


class InceptionV2Base(nn.Module):
    """`inception_v2_base` equivalent: stem + Mixed blocks, endpoint dict."""

    final_endpoint: str = "Mixed_5c"
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    DEFAULT_RAW_ENDPOINT = "Mixed_3c"
    DEFAULT_FINAL_ENDPOINT = "Mixed_5c"
    DESCRIPTOR_DIM = 1024
    NAME = "InceptionV2"
    ENDPOINTS = ENDPOINTS
    ENDPOINT_CHANNELS = ENDPOINT_CHANNELS

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.final_endpoint not in ENDPOINTS:
            raise ValueError(f"unknown endpoint {self.final_endpoint!r}")
        x = x.astype(self.dtype)
        endpoints: Dict[str, jnp.ndarray] = {}
        for name, spec in _V2_PLAN:
            kind = spec[0]
            if kind == "sep":
                _, feats, kernel, stride = spec
                x = SeparableConvBNReLU(
                    feats, kernel, stride, dtype=self.dtype,
                    bn_momentum=self.bn_momentum, name=name)(x, train)
            elif kind == "conv":
                _, feats, kernel, stride = spec
                x = ConvBNReLU(feats, kernel, stride, dtype=self.dtype,
                               bn_momentum=self.bn_momentum, name=name)(x, train)
            elif kind == "pool":
                _, kernel, stride = spec
                x = max_pool(x, kernel, stride, padding="SAME")
            elif kind == "reduce":
                _, b0r, b0, b1r, b1 = spec
                x = InceptionV2ReduceBlock(
                    b0r, b0, b1r, b1, dtype=self.dtype,
                    bn_momentum=self.bn_momentum, name=name)(x, train)
            else:
                _, b0, b1r, b1, b2r, b2, b3, pool = spec
                x = InceptionV2Block(
                    b0, b1r, b1, b2r, b2, b3, pool=pool, dtype=self.dtype,
                    bn_momentum=self.bn_momentum, name=name)(x, train)
            endpoints[name] = x
            if name == self.final_endpoint:
                return x, endpoints
        return x, endpoints  # unreachable given the check above
