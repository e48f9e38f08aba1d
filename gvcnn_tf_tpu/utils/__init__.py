from gvcnn_tf_tpu.utils.profiling import profile_trace, timed_steps  # noqa: F401
from gvcnn_tf_tpu.utils.cache import (  # noqa: F401
    setup_compilation_cache,
    tpu_compiler_options,
)
from gvcnn_tf_tpu.utils.fold_bn import fold_batch_norm  # noqa: F401
from gvcnn_tf_tpu.utils.images import normalize_views  # noqa: F401
