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
