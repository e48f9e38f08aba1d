"""Metrics / logging / observability (SURVEY.md section 5).

The reference writes `tf.summary` scalars to a FileWriter and prints via
`tf.logging` (SURVEY.md C9).  Here: structured stdout always; TensorBoard
event files via TF2's `tf.summary` when a logdir is given and TF is
importable (TF never touches the device).  Also the step-timing harness
that produces the BASELINE metrics (views/sec/chip, shapes/sec).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional


class MetricWriter:
    def __init__(self, logdir: Optional[str] = None, flush_every: int = 1):
        self._tb = None
        self.logdir = logdir
        if logdir:
            try:
                import tensorflow as tf

                tf.config.set_visible_devices([], "GPU")
                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:   # TF optional: stdout-only logging still works
                self._tb = None

    def scalars(self, step: int, values: dict):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in values.items()})
        print(json.dumps(rec), flush=True)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def flush(self):
        if self._tb is not None:
            self._tb.flush()


class NullWriter(MetricWriter):
    """Writer for non-zero processes in a multi-host run: metrics are
    global (GSPMD reductions), so only process 0 should emit them."""

    def __init__(self):
        self._tb = None
        self.logdir = None

    def scalars(self, step: int, values: dict):
        pass


class StepTimer:
    """Wall-clock throughput over a window of steps (call after
    block_until_ready at window edges)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")


def log(msg: str):
    print(f"[gvcnn_tpu] {msg}", file=sys.stderr, flush=True)
