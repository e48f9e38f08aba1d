"""Multi-view input pipeline (reference data.py / TFRecord builder, SURVEY.md
C5/C7, rebuilt for device-side prefetch to HBM — SURVEY.md B4)."""

from gvcnn_tf_tpu.data.pipeline import (  # noqa: F401
    Batch,
    dataset_size,
    make_dataset,
)
from gvcnn_tf_tpu.data.synthetic import synthetic_dataset  # noqa: F401
from gvcnn_tf_tpu.data.prefetch import (  # noqa: F401
    prefetch_to_device,
    prefetch_to_device_async,
)
