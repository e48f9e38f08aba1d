"""Model assembly for gvcnn_tf_tpu.

`backbones` mirrors the reference's vendored TF-Slim `nets/` directory
(SURVEY.md C6); `gvcnn` is the model assembly (SURVEY.md C4).
"""

from gvcnn_tf_tpu.models.gvcnn import GVCNN, SingleViewClassifier, build_model  # noqa: F401
from gvcnn_tf_tpu.models.backbones import get_backbone, BACKBONES  # noqa: F401
