"""Probe: compile the train step with AUTO device-local layouts for the
carried TrainState, device_put the state into the chosen layouts, and time
against the production default. If XLA prefers non-default layouts for the
params/opt-state, keeping them resident in that layout removes per-step
relayout copies at the executable boundary."""
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.train import create_train_state, make_train_step
from gvcnn_tf_tpu.utils import setup_compilation_cache, tpu_compiler_options

setup_compilation_cache()

cfg = get_config("mn40_12view")
cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=32))
d = cfg.data
model, tx, state = create_train_state(cfg, jax.random.key(0))
rng = np.random.RandomState(0)
batch_data = {
    "views": jnp.asarray(
        rng.rand(d.batch_size, d.num_views, d.height, d.width, 3),
        jnp.float32),
    "label": jnp.asarray(
        rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32),
}
key = jax.random.key(1)
copts = tpu_compiler_options()


def time_step(stepfn, st, tag, iters=30, chunk=10):
    st2, mets = stepfn(st, batch_data, key)
    float(jax.device_get(mets["loss"]))
    samples = []
    for _ in range(max(iters // chunk, 3)):
        t0 = time.perf_counter()
        s = st2
        for _ in range(chunk):
            s, mets = stepfn(s, batch_data, key)
        float(jax.device_get(mets["loss"]))
        samples.append((time.perf_counter() - t0) / chunk * 1e3)
    samples.sort()
    print(json.dumps({"tag": tag, "step_ms": round(samples[len(samples)//2], 2),
                      "min": round(samples[0], 2), "max": round(samples[-1], 2)}),
          flush=True)
    return samples[len(samples)//2]


# --- control: production compile (no donation here, to match the probe) ---
step_default = jax.jit(make_train_step(model, tx, cfg), compiler_options=copts)
base = time_step(step_default, state, "default_layout")

# --- AUTO layouts on the carried state ---
from jax.experimental.layout import Format, Layout

fmt_auto = Format(Layout.AUTO)
auto_in = (jax.tree.map(lambda _: fmt_auto, state),
           jax.tree.map(lambda _: None, batch_data), None)
step_auto = jax.jit(make_train_step(model, tx, cfg),
                    in_shardings=auto_in,
                    compiler_options=copts)
lowered = step_auto.lower(state, batch_data, key)
compiled = lowered.compile()
in_fmts = compiled.input_formats[0]
# How many state leaves got a non-default layout?
flat_fmts, _ = jax.tree.flatten(in_fmts[0])
flat_vals, _ = jax.tree.flatten(state)
nondefault = 0
for f, v in zip(flat_fmts, flat_vals):
    dll = f.layout
    if dll is not None and hasattr(dll, "major_to_minor"):
        ndim = getattr(v, "ndim", 0)
        if tuple(dll.major_to_minor) != tuple(range(ndim)):
            nondefault += 1
print(json.dumps({"state_leaves": len(flat_vals),
                  "nondefault_layout_leaves": nondefault}), flush=True)

state_auto = jax.device_put(state, in_fmts[0])
auto = time_step(lambda s, b, k: compiled(s, b, k), state_auto, "auto_layout")
print(json.dumps({"speedup": round(base / auto, 4)}), flush=True)
