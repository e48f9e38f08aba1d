# Developer ergonomics for gvcnn_tf_tpu.

.PHONY: test bench native clean

test:
	JAX_PLATFORM_NAME=cpu python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C gvcnn_tf_tpu/data/native

clean:
	$(MAKE) -C gvcnn_tf_tpu/data/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
