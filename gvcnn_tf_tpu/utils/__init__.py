from gvcnn_tf_tpu.utils.profiling import profile_trace, timed_steps  # noqa: F401
