"""Probe: (a) BN-folded serving forward throughput across batch sizes under
production compiler options; (b) train step at B=64 vs B=32 under the tuned
scoped-VMEM budget (r1 measured B=64 no-better at default budget)."""
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.train import create_train_state, make_train_step
from gvcnn_tf_tpu.utils import (fold_batch_norm, setup_compilation_cache,
                                tpu_compiler_options)

setup_compilation_cache()
copts = tpu_compiler_options()

cfg = get_config("mn40_12view")
d0 = cfg.data
model, tx, state = create_train_state(cfg, jax.random.key(0))
variables = fold_batch_norm(
    {"params": state.params, "batch_stats": state.batch_stats})
rng = np.random.RandomState(0)


def views_for(b):
    return jnp.asarray(
        rng.rand(b, d0.num_views, d0.height, d0.width, 3), jnp.float32)


fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0],
              compiler_options=copts)

for b in (8, 16, 32, 64, 128):
    x = views_for(b)
    out = fwd(variables, x)
    float(jax.device_get(out[0, 0]))
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(variables, x)
        float(jax.device_get(out[0, 0]))
        samples.append((time.perf_counter() - t0) / 10)
    dt = sorted(samples)[len(samples) // 2]
    print(json.dumps({"serve_batch": b, "fwd_ms": round(dt * 1e3, 2),
                      "views_per_sec": round(b * d0.num_views / dt, 1)}),
          flush=True)

# --- train at B=64 ---
for b in (64,):
    cfgb = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=b))
    step = jax.jit(make_train_step(model, tx, cfgb), compiler_options=copts)
    batch_data = {
        "views": views_for(b),
        "label": jnp.asarray(rng.randint(0, d0.num_classes, size=b),
                             jnp.int32),
    }
    key = jax.random.key(1)
    st, mets = step(state, batch_data, key)
    float(jax.device_get(mets["loss"]))
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        s = st
        for _ in range(10):
            s, mets = step(s, batch_data, key)
        float(jax.device_get(mets["loss"]))
        samples.append((time.perf_counter() - t0) / 10)
    dt = sorted(samples)[len(samples) // 2]
    print(json.dumps({"train_batch": b, "step_ms": round(dt * 1e3, 2),
                      "views_per_sec": round(b * d0.num_views / dt, 1)}),
          flush=True)
