"""Inception-v4 backbone in Flax (backbone-swap config, BASELINE config 4).

Mirrors the structure of TF-Slim `nets/inception_v4.py` (the variant the
reference may vendor — SURVEY.md C6 [MED]): stem with VALID-padded reduction
convs, 4x Inception-A (35x35x384), Reduction-A, 7x Inception-B (17x17x1024),
Reduction-B, 3x Inception-C (8x8x1536) — endpoint names Mixed_3a..Mixed_7d.
Same arg-scope conventions as inception_v1.py (conv+BN+relu, no conv bias);
BN decay 0.9997 / eps 0.001.  Spatial sizes quoted for the canonical 299
input; the net is fully convolutional (224 input -> 5x5 at Mixed_7d).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gvcnn_tf_tpu.ops.pool import max_pool




class _Conv(nn.Module):
    """ConvBNReLU with selectable padding (v4 stem uses VALID reductions)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=0.001, dtype=self.dtype,
                         param_dtype=jnp.float32, use_scale=False,
                         name="BatchNorm")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(96, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_3x3")(b1, train)
        b2 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_3x3")(b2, train)
        b2 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_3x3")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(96, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], -1)          # 384


class ReductionA(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(384, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_0_Conv2d_1a_3x3")(x, train)
        b1 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(224, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_3x3")(b1, train)
        b1 = _Conv(256, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_1_Conv2d_1a_3x3")(b1, train)
        b2 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], -1)              # 1024


class InceptionB(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(384, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(224, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = _Conv(256, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0c_7x1")(b1, train)
        b2 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(192, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_7x1")(b2, train)
        b2 = _Conv(224, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_1x7")(b2, train)
        b2 = _Conv(224, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0d_7x1")(b2, train)
        b2 = _Conv(256, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0e_1x7")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(128, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], -1)          # 1024


class ReductionB(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b0 = _Conv(192, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_0_Conv2d_1a_3x3")(b0, train)
        b1 = _Conv(256, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(256, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = _Conv(320, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0c_7x1")(b1, train)
        b1 = _Conv(320, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_1_Conv2d_1a_3x3")(b1, train)
        b2 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], -1)              # 1536


class InceptionC(nn.Module):
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(256, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(384, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1a = _Conv(256, (1, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_1x3")(b1, train)
        b1b = _Conv(256, (3, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0c_3x1")(b1, train)
        b2 = _Conv(384, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(448, (3, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_3x1")(b2, train)
        b2 = _Conv(512, (1, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_1x3")(b2, train)
        b2a = _Conv(256, (1, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0d_1x3")(b2, train)
        b2b = _Conv(256, (3, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0e_3x1")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(256, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], -1)  # 1536


# Endpoint order for final_endpoint truncation.
ENDPOINTS = (
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Mixed_3a",
    "Mixed_4a", "Mixed_5a",
    "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_5e",
    "Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_6f",
    "Mixed_6g", "Mixed_6h",
    "Mixed_7a", "Mixed_7b", "Mixed_7c", "Mixed_7d",
)


class InceptionV4Base(nn.Module):
    """`inception_v4_base` equivalent: stem + A/B/C towers, endpoint dict."""

    final_endpoint: str = "Mixed_7d"
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    DEFAULT_RAW_ENDPOINT = "Mixed_5e"
    DEFAULT_FINAL_ENDPOINT = "Mixed_7d"
    DESCRIPTOR_DIM = 1536
    NAME = "InceptionV4"
    ENDPOINTS = ENDPOINTS

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.final_endpoint not in ENDPOINTS:
            raise ValueError(f"unknown endpoint {self.final_endpoint!r}")
        d = self.dtype
        x = x.astype(d)
        endpoints: Dict[str, jnp.ndarray] = {}

        def done(name, val):
            endpoints[name] = val
            return name == self.final_endpoint

        net = _Conv(32, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                    name="Conv2d_1a_3x3")(x, train)
        if done("Conv2d_1a_3x3", net):
            return net, endpoints
        net = _Conv(32, (3, 3), padding="VALID", dtype=d, bn_momentum=self.bn_momentum,
                    name="Conv2d_2a_3x3")(net, train)
        if done("Conv2d_2a_3x3", net):
            return net, endpoints
        net = _Conv(64, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Conv2d_2b_3x3")(net, train)
        if done("Conv2d_2b_3x3", net):
            return net, endpoints

        # Mixed_3a: maxpool/2 || conv 96/2 VALID
        p = max_pool(net, (3, 3), (2, 2), padding="VALID")
        c = _Conv(96, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                  name="Mixed_3a_Branch_1_Conv2d_0a_3x3")(net, train)
        net = jnp.concatenate([p, c], -1)                     # 160
        if done("Mixed_3a", net):
            return net, endpoints

        # Mixed_4a: 1x1->3x3 VALID || 1x1->1x7->7x1->3x3 VALID
        b0 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_0_Conv2d_0a_1x1")(net, train)
        b0 = _Conv(96, (3, 3), padding="VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_0_Conv2d_1a_3x3")(b0, train)
        b1 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_1_Conv2d_0a_1x1")(net, train)
        b1 = _Conv(64, (1, 7), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = _Conv(64, (7, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_1_Conv2d_0c_7x1")(b1, train)
        b1 = _Conv(96, (3, 3), padding="VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_4a_Branch_1_Conv2d_1a_3x3")(b1, train)
        net = jnp.concatenate([b0, b1], -1)                   # 192
        if done("Mixed_4a", net):
            return net, endpoints

        # Mixed_5a: conv 192/2 VALID || maxpool/2
        c = _Conv(192, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                  name="Mixed_5a_Branch_0_Conv2d_1a_3x3")(net, train)
        p = max_pool(net, (3, 3), (2, 2), padding="VALID")
        net = jnp.concatenate([c, p], -1)                     # 384
        if done("Mixed_5a", net):
            return net, endpoints

        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_5e"]:
            net = InceptionA(dtype=d, bn_momentum=self.bn_momentum, name=name)(net, train)
            if done(name, net):
                return net, endpoints
        net = ReductionA(dtype=d, bn_momentum=self.bn_momentum, name="Mixed_6a")(net, train)
        if done("Mixed_6a", net):
            return net, endpoints
        for name in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_6f", "Mixed_6g", "Mixed_6h"]:
            net = InceptionB(dtype=d, bn_momentum=self.bn_momentum, name=name)(net, train)
            if done(name, net):
                return net, endpoints
        net = ReductionB(dtype=d, bn_momentum=self.bn_momentum, name="Mixed_7a")(net, train)
        if done("Mixed_7a", net):
            return net, endpoints
        for name in ["Mixed_7b", "Mixed_7c", "Mixed_7d"]:
            net = InceptionC(dtype=d, bn_momentum=self.bn_momentum, name=name)(net, train)
            if done(name, net):
                return net, endpoints
        return net, endpoints
