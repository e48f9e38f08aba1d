"""Backbone registry (the reference's vendored TF-Slim `nets/`, SURVEY.md C6).

Each backbone is a Flax module with the interface:

    feats, endpoints = Backbone(...)(x, train=...)

where `endpoints` is a slim-style ordered dict of named activations, so the
GVCNN head can tap any endpoint for the raw view descriptor exactly like the
reference taps `inception_v1_base(..., final_endpoint=...)`.
"""

from gvcnn_tf_tpu.models.backbones.inception_v1 import InceptionV1Base  # noqa: F401

BACKBONES = {}


def register(name):
    def deco(cls):
        BACKBONES[name] = cls
        return cls
    return deco


def get_backbone(name: str):
    # Lazy-register heavier variants to keep import cheap.
    if name not in BACKBONES:
        if name == "inception_v1":
            BACKBONES[name] = InceptionV1Base
        elif name == "inception_v2":
            from gvcnn_tf_tpu.models.backbones.inception_v2 import InceptionV2Base
            BACKBONES[name] = InceptionV2Base
        elif name == "inception_v3":
            from gvcnn_tf_tpu.models.backbones.inception_v3 import InceptionV3Base
            BACKBONES[name] = InceptionV3Base
        elif name == "inception_v4":
            from gvcnn_tf_tpu.models.backbones.inception_v4 import InceptionV4Base
            BACKBONES[name] = InceptionV4Base
        elif name == "resnet50":
            from gvcnn_tf_tpu.models.backbones.resnet import ResNet50Base
            BACKBONES[name] = ResNet50Base
        else:
            raise KeyError(f"unknown backbone {name!r}")
    return BACKBONES[name]
