"""gvcnn_tf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of GVCNN.

Reference capability set: ace19-dev/gvcnn-tf (TF1 + tf.slim implementation of
"GVCNN: Group-View Convolutional Neural Networks for 3D Shape Recognition",
Feng et al., CVPR 2018).  See /root/repo/SURVEY.md for the component map this
package mirrors.  This is NOT a port: the compute path is a single dense
(B*V)-folded backbone pass on the MXU, the grouping head is static-shaped mask
math (optionally fused into a Pallas kernel), and scaling is data-parallel
`jax.sharding` over an ICI mesh instead of the reference's single-GPU
Session loop.

Public API (mirrors reference train.py / eval.py / predict.py entry points,
SURVEY.md section 7 "Public API surface"):

    from gvcnn_tf_tpu import train, evaluate, predict
    from gvcnn_tf_tpu.configs import GVCNNConfig, CONFIGS
    from gvcnn_tf_tpu.models import build_model

NOTE: `train`/`evaluate`/`predict` are re-bound to the callables below AFTER
their defining submodules import, so `gvcnn_tf_tpu.train` is the function
while `python -m gvcnn_tf_tpu.train` still runs the module CLI.
"""

__version__ = "0.1.0"

# Honor an explicit CPU request (JAX_PLATFORM_NAME=cpu / JAX_PLATFORMS=cpu)
# through jax.config, which wins over plugin auto-registration.  This
# environment's sitecustomize force-registers a remote TPU platform whose
# discovery BLOCKS when the device tunnel is unreachable — with only the
# env var set, even CPU-only runs hang at backend init.  jax.config's
# explicit platform list skips initializing the remote plugin entirely.
import os as _os

_plat = (_os.environ.get("JAX_PLATFORM_NAME")
         or _os.environ.get("JAX_PLATFORMS") or "").strip().lower()
if _plat == "cpu":
    import jax as _jax

    try:  # no-op if a backend is already initialized
        _jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

from gvcnn_tf_tpu.configs import (  # noqa: F401
    GVCNNConfig,
    DataConfig,
    TrainConfig,
    CONFIGS,
    get_config,
)

# Rebind the package attributes from submodule to callable (see NOTE above).
from gvcnn_tf_tpu.train import train  # noqa: F401,E402
from gvcnn_tf_tpu.eval import evaluate  # noqa: F401,E402
from gvcnn_tf_tpu.predict import predict  # noqa: F401,E402
