"""Sweep XLA:TPU compiler flags over the flagship train step.

The round-3 marginal attribution (docs/PERF_LAYERS.md) leaves a ~26 ms
whole-tower-vs-marginal-sum residual that no single layer owns — shared
scheduling/buffer traffic.  Per-layer code transforms cannot reach it, but
compiler-level knobs might.  This tool times the REAL jitted train step
under each XLA_FLAGS setting in a fresh subprocess (flags are
process-global and participate in the compile-cache key, so isolation is
mandatory) and reports step time vs the default.

Usage (real chip; each setting pays a full compile, minutes apiece):

    python -m gvcnn_tf_tpu.tools.bench_xla_flags --batch 32 --iters 30
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# (name, XLA_FLAGS fragment) — '' is the default-compiler control row.
SETTINGS = [
    ("default", ""),
    # Bigger scoped-VMEM budget lets the fusion pass keep larger conv
    # operands resident instead of spilling tiles to HBM.
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    # Latency-hiding scheduler: mostly for async collectives, but also
    # reorders copies/compute on a single core.
    ("lhs_off", "--xla_tpu_enable_latency_hiding_scheduler=false"),
]

_CHILD = r"""
import json, sys
from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.tools.bench_variants import time_variant

cfg = get_config("mn40_12view")
dt, flops = time_variant(cfg, batch=int(sys.argv[1]), iters=int(sys.argv[2]))
print(json.dumps({"step_ms": dt * 1e3, "flops": flops}))
"""


def run_setting(name: str, flags: str, batch: int, iters: int) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # Flag experiments must NOT poison or reuse the shared compile cache:
    # flags are part of the key, but keep them hermetic anyway.
    env["JAX_COMPILATION_CACHE_DIR"] = env.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(batch), str(iters)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        r = json.loads(line)
    except Exception:
        return {"name": name, "flags": flags, "error":
                (out.stderr or out.stdout)[-500:]}
    return {"name": name, "flags": flags,
            "step_ms": round(r["step_ms"], 2)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--settings", default=None,
                   help="comma-separated subset of setting names")
    p.add_argument("--out", default=None, help="append markdown table here")
    args = p.parse_args(argv)
    want = set(args.settings.split(",")) if args.settings else None

    rows = []
    base_ms = None
    for name, flags in SETTINGS:
        if want and name not in want:
            continue
        r = run_setting(name, flags, args.batch, args.iters)
        if "step_ms" in r:
            if name == "default":
                base_ms = r["step_ms"]
            if base_ms:
                r["vs_default"] = round(r["step_ms"] / base_ms, 4)
        print(json.dumps(r), flush=True)
        rows.append(r)

    if args.out:
        lines = ["", "## XLA flag sweep (flagship train step)", "",
                 "| setting | flags | step ms | vs default |", "|---|---|---|---|"]
        for r in rows:
            lines.append(
                f"| {r['name']} | `{r.get('flags') or '(default)'}` | "
                f"{r.get('step_ms', 'error')} | {r.get('vs_default', '')} |")
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
    return rows


if __name__ == "__main__":
    main()
