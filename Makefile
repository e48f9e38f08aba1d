# Developer ergonomics for gvcnn_tf_tpu.

.PHONY: test test-fast test-slow bench native clean profile collectives

# Full suite. On a 1-core host this exceeds 10 minutes; use test-fast for
# the quick signal and test-slow for the end-to-end half.
test:
	JAX_PLATFORM_NAME=cpu python -m pytest tests/ -x -q

test-fast:
	JAX_PLATFORM_NAME=cpu python -m pytest tests/ -x -q -m "not slow"

test-slow:
	JAX_PLATFORM_NAME=cpu python -m pytest tests/ -x -q -m "slow"

bench:
	python bench.py

# Schedule-based profile of the flagship train step (per-layer table +
# Perfetto trace at /tmp/step_trace.json; compile-only, works on the chip).
profile:
	python -m gvcnn_tf_tpu.tools.profile_step --mode train \
		--trace /tmp/step_trace.json

# Compile-time collective audit of the 8-device DP step (pod scaling).
collectives:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		JAX_PLATFORM_NAME=cpu \
		python -m gvcnn_tf_tpu.tools.analyze_collectives --devices 8

native:
	$(MAKE) -C gvcnn_tf_tpu/data/native

clean:
	$(MAKE) -C gvcnn_tf_tpu/data/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
