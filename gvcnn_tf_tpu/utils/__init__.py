from gvcnn_tf_tpu.utils.profiling import profile_trace, timed_steps  # noqa: F401
from gvcnn_tf_tpu.utils.cache import setup_compilation_cache  # noqa: F401
from gvcnn_tf_tpu.utils.fold_bn import fold_batch_norm  # noqa: F401
