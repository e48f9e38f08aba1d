"""Tracing / profiling harness (SURVEY.md section 5: the reference has only
tf.summary scalars; here jax.profiler traces + a block_until_ready timing
harness producing the BASELINE metrics)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a Perfetto/TensorBoard trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steps(fn: Callable, *args, warmup: int = 3, iters: int = 10,
                **kwargs) -> float:
    """Median-free mean seconds/call with proper device sync.

    `fn` must return jax arrays (or pytrees of them); warmup runs cover
    compile + autotune so the measurement is steady-state.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
