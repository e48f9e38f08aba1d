"""ResNet-50 (v1) backbone in Flax (backbone-swap config, BASELINE config 4).

Follows TF-Slim `nets/resnet_v1.py` conventions (the other swap candidate in
BASELINE.json:10): 7x7/2 stem + 3x3/2 maxpool, bottleneck blocks [3, 4, 6, 3]
with output widths 256/512/1024/2048, block strides (2, 2, 2, 1) applied at
the LAST unit of each block (slim's resnet_v1_block convention — unlike
torchvision, which strides the first unit of the NEXT stage; the two give
different intermediate endpoint shapes: slim block1 = 28x28x256), BN decay
0.997 / eps 1e-5 (slim resnet_arg_scope), post-activation (v1) residuals.
Endpoints: conv1, block1..block4.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gvcnn_tf_tpu.ops.pool import max_pool


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Any = jnp.float32
    bn_momentum: float = 0.997

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="BatchNorm")(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """v1 bottleneck: 1x1 reduce -> 3x3 -> 1x1 expand, post-activation add."""

    width: int                 # bottleneck width; output = 4 * width
    stride: int = 1
    dtype: Any = jnp.float32
    bn_momentum: float = 0.997

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out_ch = 4 * self.width
        shortcut = x
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = _ConvBN(out_ch, (1, 1), (self.stride, self.stride),
                               relu=False, dtype=d, bn_momentum=self.bn_momentum, name="shortcut")(x, train)
        y = _ConvBN(self.width, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="conv1")(x, train)
        y = _ConvBN(self.width, (3, 3), (self.stride, self.stride),
                    dtype=d, bn_momentum=self.bn_momentum, name="conv2")(y, train)
        y = _ConvBN(out_ch, (1, 1), relu=False, dtype=d, bn_momentum=self.bn_momentum, name="conv3")(y, train)
        return nn.relu(shortcut + y)


_BLOCKS = (("block1", 64, 3, 2), ("block2", 128, 4, 2),
           ("block3", 256, 6, 2), ("block4", 512, 3, 1))

ENDPOINTS = ("conv1",) + tuple(b[0] for b in _BLOCKS)


class ResNet50Base(nn.Module):
    final_endpoint: str = "block4"
    dtype: Any = jnp.float32
    bn_momentum: float = 0.997

    DEFAULT_RAW_ENDPOINT = "block2"
    DEFAULT_FINAL_ENDPOINT = "block4"
    DESCRIPTOR_DIM = 2048
    NAME = "ResNet50"
    ENDPOINTS = ENDPOINTS

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.final_endpoint not in ENDPOINTS:
            raise ValueError(f"unknown endpoint {self.final_endpoint!r}")
        d = self.dtype
        x = x.astype(d)
        endpoints: Dict[str, jnp.ndarray] = {}

        net = _ConvBN(64, (7, 7), (2, 2), dtype=d, bn_momentum=self.bn_momentum, name="conv1")(x, train)
        net = max_pool(net, (3, 3), (2, 2), padding="SAME")
        endpoints["conv1"] = net
        if self.final_endpoint == "conv1":
            return net, endpoints

        for name, width, units, stride in _BLOCKS:
            for u in range(units):
                # slim resnet_v1_block: the block's stride is applied at the
                # LAST unit (torchvision strides the first unit instead).
                net = Bottleneck(
                    width, stride if u == units - 1 else 1, dtype=d,
                    bn_momentum=self.bn_momentum,
                    name=f"{name}_unit{u + 1}",
                )(net, train)
            endpoints[name] = net
            if name == self.final_endpoint:
                return net, endpoints
        return net, endpoints
