# Developer ergonomics for gvcnn_tf_tpu.

.PHONY: test test-fast test-slow bench native clean

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

native:
	$(MAKE) -C gvcnn_tf_tpu/data/native

clean:
	$(MAKE) -C gvcnn_tf_tpu/data/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
