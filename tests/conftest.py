"""Test harness config.

All tests run on CPU with 8 virtual XLA host devices so the data-parallel
sharding path (SURVEY.md B1) is exercised without a TPU pod — the JAX-native
equivalent of a fake multi-node backend (SURVEY.md section 4).

NOTE: this environment's sitecustomize force-registers a remote `axon` TPU
platform and pins JAX_PLATFORMS=axon; plain env overrides are rewritten, so
we force CPU through jax.config (verified to win over the plugin).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the suite (VERDICT r2 Next #7): the wall
# time is dominated by XLA:CPU compiles of small-but-deep models, and the
# same programs recompile on every run.  Safe here because the same host
# writes and reads the cache (utils/cache.py's SIGILL concern is about
# migrating entries across hosts with different CPU features); measured
# 12.8 s -> 1.4 s on a truncated-backbone compile.  Delete the dir if the
# toolchain changes underneath it.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GVCNN_TEST_CACHE", "/tmp/jax_cpu_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
