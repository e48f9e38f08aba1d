"""Sweep XLA:TPU compiler options over the flagship train step.

The round-3 marginal attribution (docs/PERF_LAYERS.md) leaves a ~26 ms
whole-tower-vs-marginal-sum residual that no single layer owns — shared
scheduling/buffer traffic.  Per-layer code transforms cannot reach it, but
compiler-level knobs might.

Mechanism note: XLA_FLAGS cannot carry TPU flags here — under the remote
axon PJRT plugin the CLIENT binary is CPU-only XLA and hard-aborts on
unknown flags ("Unknown flag in XLA_FLAGS", measured).  Per-compile
`compiler_options` go through PJRT to the server-side compiler instead,
so each setting is just a recompile in-process.

Usage (real chip; each setting pays a full compile, minutes apiece):

    python -m gvcnn_tf_tpu.tools.bench_xla_flags --batch 32 --iters 30
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, compiler_options dict) — {} is the default-compiler control row.
SETTINGS = [
    ("default", {}),
    # Bigger scoped-VMEM budget lets the fusion pass keep larger conv
    # operands resident instead of spilling tiles to HBM.
    ("vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem_28m", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),
    ("vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    # Latency-hiding scheduler off: reorders copies/compute differently.
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    # Reduce+broadcast fusion toggle (BN patterns are reduce->broadcast).
    ("rwb_off", {"xla_tpu_rwb_fusion": "false"}),
]

# Round-3b: candidate server-side options stacked ON TOP of the winning
# 32 MiB scoped-VMEM budget.  Unknown options are rejected by the
# server-side compiler and recorded as error rows — that is the probe.
_V32 = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
SETTINGS += [
    ("v32", dict(_V32)),
    ("v32_licm2",
     dict(_V32, xla_tpu_licm_size_inflation_ratio="2.0")),
    ("v32_dot_dot_off",
     dict(_V32, xla_tpu_dot_dot_fusion="false")),
    ("v32_dot_strength_off",
     dict(_V32, xla_tpu_enable_dot_strength_reduction="false")),
    ("v32_same_offset",
     dict(_V32, xla_tpu_allocate_scoped_vmem_at_same_offset="false")),
    ("v32_prefetch_repeat",
     dict(_V32,
          xla_tpu_use_repeated_instance_for_preferred_prefetch_time="true")),
    ("v32_msa_ratio",
     dict(_V32, xla_tpu_msa_inefficient_use_to_copy_ratio="0.5")),
    ("v32_aggressive_opt",
     dict(_V32, xla_tpu_enable_aggressive_loop_fusion_layout_opt="true")),
    ("v32_vector_load",
     dict(_V32, xla_tpu_vector_load_fusion_window="2048")),
    ("v32_retain_sched",
     dict(_V32, xla_latency_hiding_scheduler_rerun="2")),
]

# Round-3b: re-bracket the VMEM budget WITH dot-strength-reduction off
# (the production combination) — fusion decisions flip with the budget, so
# the optimum could move when the rewrite set changes.
_DS = {"xla_tpu_enable_dot_strength_reduction": "false"}
SETTINGS += [
    (f"ds_v{k // 1024}m",
     dict(_DS, xla_tpu_scoped_vmem_limit_kib=str(k)))
    for k in (28672, 30720, 32768, 34816, 36864, 40960)
]


def time_compiled(compiled, args, iters: int, chunk: int = 10) -> float:
    """Median step seconds for a pre-compiled executable (axon-safe sync)."""
    out = compiled(*args)
    float(jax.device_get(out[1]["loss"]))
    samples = []
    for _ in range(max(iters // chunk, 3)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = compiled(*args)
        float(jax.device_get(out[1]["loss"]))
        samples.append((time.perf_counter() - t0) / chunk)
    return sorted(samples)[len(samples) // 2]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--settings", default=None,
                   help="comma-separated subset of setting names")
    p.add_argument("--out", default=None, help="append markdown table here")
    args = p.parse_args(argv)
    want = set(args.settings.split(",")) if args.settings else None

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.train import create_train_state, make_train_step
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    cfg = get_config("mn40_12view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=args.batch))
    d = cfg.data
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    from gvcnn_tf_tpu.configs import resolve_transfer_dtype

    rng = np.random.RandomState(0)
    # Feed at the production transfer dtype (bf16 for bf16 configs) so the
    # A/B rankings measure the program production actually runs.
    batch_data = {
        "views": jnp.asarray(
            rng.rand(d.batch_size, d.num_views, d.height, d.width, 3),
            jnp.float32).astype(resolve_transfer_dtype(cfg) or jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32),
    }
    key = jax.random.key(1)
    lowered = jax.jit(make_train_step(model, tx, cfg)).lower(
        state, batch_data, key)

    rows = []
    base_ms = None
    for name, opts in SETTINGS:
        if want and name not in want:
            continue
        try:
            compiled = lowered.compile(
                compiler_options=opts or None)
            dt = time_compiled(
                compiled, (state, batch_data, key), args.iters)
            r = {"name": name, "options": opts,
                 "step_ms": round(dt * 1e3, 2)}
            if name == "default":
                base_ms = r["step_ms"]
            if base_ms:
                r["vs_default"] = round(r["step_ms"] / base_ms, 4)
        except Exception as e:
            r = {"name": name, "options": opts,
                 "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)
        rows.append(r)

    if args.out:
        lines = ["", "## XLA compiler-option sweep (flagship train step)",
                 "", "| setting | options | step ms | vs default |",
                 "|---|---|---|---|"]
        for r in rows:
            lines.append(
                f"| {r['name']} | `{r.get('options') or '(default)'}` | "
                f"{r.get('step_ms', r.get('error', '?'))} | "
                f"{r.get('vs_default', '')} |")
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
    return rows


if __name__ == "__main__":
    main()
