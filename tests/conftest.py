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

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
