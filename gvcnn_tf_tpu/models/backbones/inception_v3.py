"""Inception-v3 backbone in Flax (backbone swap; SURVEY.md C6 lists
inception_v2/v3/v4 as likely vendored slim variants [MED]).

Structure follows TF-Slim `nets/inception_v3.py`: VALID-padded stem to
35x35x192, 3x Inception-A (Mixed_5b-5d), grid reduction Mixed_6a to
17x17x768, 4x factorized-7x7 blocks (Mixed_6b-6e), reduction Mixed_7a to
8x8x1280, 2x expanded blocks (Mixed_7b-7c, 2048 ch).  Spatial sizes quoted
for the canonical 299 input; fully convolutional otherwise.  Same
conv+BN+relu arg-scope conventions as inception_v1.py.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from gvcnn_tf_tpu.ops.pool import max_pool

from gvcnn_tf_tpu.models.backbones.inception_v4 import _Conv


class _BlockA(nn.Module):
    """35x35 block: 1x1 / 5x5 / double-3x3 / pool-proj."""

    pool_proj: int
    b1_reduce: int = 48
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(self.b1_reduce, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(64, (5, 5), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_5x5")(b1, train)
        b2 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_3x3")(b2, train)
        b2 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_3x3")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(self.pool_proj, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class _BlockB(nn.Module):
    """17x17 block with factorized 7x7 convs."""

    width: int                     # 128 / 160 / 192
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d, w = self.dtype, self.width
        b0 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(w, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(w, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = _Conv(192, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0c_7x1")(b1, train)
        b2 = _Conv(w, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(w, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_7x1")(b2, train)
        b2 = _Conv(w, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_1x7")(b2, train)
        b2 = _Conv(w, (7, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0d_7x1")(b2, train)
        b2 = _Conv(192, (1, 7), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0e_1x7")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], -1)          # 768


class _BlockC(nn.Module):
    """8x8 block with expanded 1x3/3x1 branches (2048 ch out)."""

    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(320, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_0_Conv2d_0a_1x1")(x, train)
        b1 = _Conv(384, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1a = _Conv(384, (1, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0b_1x3")(b1, train)
        b1b = _Conv(384, (3, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_1_Conv2d_0c_3x1")(b1, train)
        b2 = _Conv(448, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = _Conv(384, (3, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0b_3x3")(b2, train)
        b2a = _Conv(384, (1, 3), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0c_1x3")(b2, train)
        b2b = _Conv(384, (3, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_2_Conv2d_0d_3x1")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum, name="Branch_3_Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], -1)


ENDPOINTS = (
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "MaxPool_3a_3x3",
    "Conv2d_3b_1x1", "Conv2d_4a_3x3", "MaxPool_5a_3x3",
    "Mixed_5b", "Mixed_5c", "Mixed_5d",
    "Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
    "Mixed_7a", "Mixed_7b", "Mixed_7c",
)


class InceptionV3Base(nn.Module):
    """`inception_v3_base` equivalent: stem + towers, endpoint dict."""

    final_endpoint: str = "Mixed_7c"
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    DEFAULT_RAW_ENDPOINT = "Mixed_5d"
    DEFAULT_FINAL_ENDPOINT = "Mixed_7c"
    DESCRIPTOR_DIM = 2048
    NAME = "InceptionV3"
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
        net = max_pool(net, (3, 3), (2, 2), padding="VALID")
        if done("MaxPool_3a_3x3", net):
            return net, endpoints
        net = _Conv(80, (1, 1), padding="VALID", dtype=d, bn_momentum=self.bn_momentum,
                    name="Conv2d_3b_1x1")(net, train)
        if done("Conv2d_3b_1x1", net):
            return net, endpoints
        net = _Conv(192, (3, 3), padding="VALID", dtype=d, bn_momentum=self.bn_momentum,
                    name="Conv2d_4a_3x3")(net, train)
        if done("Conv2d_4a_3x3", net):
            return net, endpoints
        net = max_pool(net, (3, 3), (2, 2), padding="VALID")
        if done("MaxPool_5a_3x3", net):
            return net, endpoints

        for name, proj, b1r in [("Mixed_5b", 32, 48), ("Mixed_5c", 64, 48),
                                ("Mixed_5d", 64, 48)]:
            net = _BlockA(pool_proj=proj, b1_reduce=b1r, dtype=d, bn_momentum=self.bn_momentum,
                          name=name)(net, train)
            if done(name, net):
                return net, endpoints

        # Mixed_6a: grid reduction 35 -> 17.
        b0 = _Conv(384, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_6a_Branch_0_Conv2d_1a_1x1")(net, train)
        b1 = _Conv(64, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_6a_Branch_1_Conv2d_0a_1x1")(net, train)
        b1 = _Conv(96, (3, 3), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_6a_Branch_1_Conv2d_0b_3x3")(b1, train)
        b1 = _Conv(96, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_6a_Branch_1_Conv2d_1a_1x1")(b1, train)
        b2 = max_pool(net, (3, 3), (2, 2), padding="VALID")
        net = jnp.concatenate([b0, b1, b2], -1)               # 768
        if done("Mixed_6a", net):
            return net, endpoints

        for name, w in [("Mixed_6b", 128), ("Mixed_6c", 160),
                        ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            net = _BlockB(width=w, dtype=d, bn_momentum=self.bn_momentum, name=name)(net, train)
            if done(name, net):
                return net, endpoints

        # Mixed_7a: grid reduction 17 -> 8.
        b0 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_0_Conv2d_0a_1x1")(net, train)
        b0 = _Conv(320, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_0_Conv2d_1a_3x3")(b0, train)
        b1 = _Conv(192, (1, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_1_Conv2d_0a_1x1")(net, train)
        b1 = _Conv(192, (1, 7), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = _Conv(192, (7, 1), dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_1_Conv2d_0c_7x1")(b1, train)
        b1 = _Conv(192, (3, 3), (2, 2), "VALID", dtype=d, bn_momentum=self.bn_momentum,
                   name="Mixed_7a_Branch_1_Conv2d_1a_3x3")(b1, train)
        b2 = max_pool(net, (3, 3), (2, 2), padding="VALID")
        net = jnp.concatenate([b0, b1, b2], -1)               # 1280
        if done("Mixed_7a", net):
            return net, endpoints

        for name in ["Mixed_7b", "Mixed_7c"]:
            net = _BlockC(dtype=d, bn_momentum=self.bn_momentum, name=name)(net, train)
            if done(name, net):
                return net, endpoints
        return net, endpoints
