"""Persistent XLA compilation cache setup.

First compiles are expensive (and in remote-compile environments, very
expensive — ~8 min for the flagship train step); the persistent cache cuts
repeats to seconds.  Called by every driver and by bench.py.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = "/tmp/jax_cache"


def setup_compilation_cache(path: str | None = None) -> str | None:
    # TPU only: XLA:CPU AOT cache entries embed host CPU features and can
    # SIGILL when loaded on a host whose feature set differs (observed once
    # in this container); CPU compiles are cheap enough to redo.
    if jax.default_backend() != "tpu":
        return None
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def tpu_compiler_options(extra: dict | None = None) -> dict | None:
    """Tuned XLA:TPU compiler options for the hot jits (None off-TPU).

    `xla_tpu_scoped_vmem_limit_kib=32768` measured on v5e-1
    (tools/bench_xla_flags.py, round 3): flagship train step 79.2 -> 75.6 ms
    (-4.6%) and BN-folded forward 20.0 -> 18.9 ms (-5.5%) vs the default
    budget; 48 MiB regresses badly (+21%, fusion-decision cliff), 64 MiB
    ties 32 MiB.  The larger scoped-VMEM budget lets the fusion pass keep
    bigger conv operand tiles resident instead of spilling to HBM.

    `xla_tpu_enable_dot_strength_reduction=false` (round 3b): disabling the
    strength-reduction rewrite of skinny dots wins consistently on the train
    step — 4/4 paired A/B runs faster by 0.4-1.7 ms (mean -0.95 ms, -1.2%;
    76.9 -> 76.0 ms across runs).  The rewrite turns small dots (grouping
    head / FC layers) into reduce trees that fuse worse here.

    Overrides: env GVCNN_SCOPED_VMEM_KIB (a number, or "0" to disable) and
    GVCNN_DOT_STRENGTH_REDUCTION=1 to re-enable the rewrite.  Passed through
    PJRT per-compile — XLA_FLAGS cannot carry TPU flags under the
    remote-client plugin (it hard-aborts on unknown flags).
    """
    if jax.default_backend() != "tpu":
        return None
    kib = os.environ.get("GVCNN_SCOPED_VMEM_KIB", "32768")
    opts = dict(extra or {})
    if kib and kib != "0":
        opts["xla_tpu_scoped_vmem_limit_kib"] = kib
    if os.environ.get("GVCNN_DOT_STRENGTH_REDUCTION", "0") != "1":
        opts["xla_tpu_enable_dot_strength_reduction"] = "false"
    return opts or None
