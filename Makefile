# Developer ergonomics for gvcnn_tf_tpu.

.PHONY: test test-fast test-slow bench native clean profile collectives \
	residual loadgen rehearsal

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

# Shared-cost decomposition of the flagship step (optimizer/copies/loss
# buckets + fwd->bwd activation-save bytes; compile-only).
residual:
	python -m gvcnn_tf_tpu.tools.profile_step --mode train --residual

# Closed-loop multi-client serving load (needs a checkpoint dir).
loadgen:
	python -m gvcnn_tf_tpu.tools.loadgen --config mn40_12view \
		--checkpoint_dir $(CKPT) --clients 4 --duration 10

# Flagship dress rehearsal: GVCNN vs MVCNN at the reference operating
# point (224x224, 12 views, 40 classes) on the procedural benchmark.
rehearsal:
	python -m gvcnn_tf_tpu.tools.proc_benchmark --num_classes 40 \
		--num_views 12 --height 224 --batch 32 --train_shapes 1200 \
		--eval_shapes 400 --steps 3000 --learning_rate 0.001 \
		--out docs/STATUS.md

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
