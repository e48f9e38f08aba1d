"""Compiler-schedule profiler: per-layer timing + Perfetto trace, no runtime.

SURVEY.md §5 lists tracing/profiling as a reference subsystem
(tf.profiler / timeline in the TF1 stack).  `jax.profiler` hangs under this
container's remote axon PJRT plugin (guarded in train.py), so this tool
closes the gap the TPU-native way: the SCHEDULED optimized HLO of the
flagship step already carries, per instruction, the TPU compiler's own
`estimated_cycles` AND the originating module path (`op_name` metadata,
e.g. ``.../GoogLeNet/Mixed_4b/Branch_1/Conv2d_0a_1x1/...``).  Since the
scheduled entry computation lists instructions in issue order, cumulative
cycles ARE a timeline — the same information a hardware trace viewer shows,
minus true overlap (the estimate is per-op serial cost).

Outputs:
  * per-layer aggregation (forward vs backward split, % of step) — the
    table a profiler's "group by op" view gives;
  * optionally (--trace out.json) a chrome-trace/Perfetto file with one
    complete event per scheduled instruction, tracks split fwd/bwd/other.

The per-op cycle estimates are the compiler's cost model, not a hardware
counter: whole-step estimated ms typically lands within ~15% of the
measured step (compare bench.py) but per-op overlap is not modeled.  For
measured per-layer wall times use tools/bench_layers.py (marginal A/B);
this tool is the schedule/attribution view that needs only a compile.

Usage (real chip; compile-only):

    python -m gvcnn_tf_tpu.tools.profile_step --mode train \
        --trace /tmp/step_trace.json --top 25
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import re

# v5e TensorCore clock; cycles -> wall time conversion for the estimates.
CLOCK_HZ = 0.94e9
# v5e HBM bandwidth — converts activation-save bytes to HBM-time.
HBM_BPS = 819e9

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}


def shape_bytes(shape: str) -> int:
    """Logical bytes of an HLO shape string (tuples sum their leaves).

    ``bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)}`` -> 384*28*28*96*2.
    Layout/tiling annotations are ignored (logical, not padded, bytes —
    a lower bound on the HBM footprint).
    """
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape):
        if dt not in _DTYPE_BYTES:
            continue  # token[] etc.
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total

_LINE = re.compile(
    r"\s*(?:ROOT )?%([\w.\-]+) = "
    r"(\([^)]*\)|\S+?\[[^\]]*\]\S*) ([a-z\-]+)\(")
_CYCLES = re.compile(r'"estimated_cycles":"(\d+)"')
_OPNAME = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
# Module-path components that name a layer in any of our backbones/heads.
_LAYER = re.compile(
    r"(Conv2d[\w.]*|MaxPool[\w.]*|AvgPool[\w.]*|Mixed_[\w.]*|"
    r"conv\d+[\w.]*|block\d+[\w.]*|stem|Logits[\w.]*|AuxLogits[\w.]*|"
    r"GroupingModule|grouping|group_fusion|view_pool|Dense_\d+|head)")


def parse_entry(hlo: str):
    """Scheduled-entry instructions in issue order.

    -> list of {name, op, shape, cycles, op_name} (only the ENTRY
    computation: fused subcomputations carry no schedule or cycle info).
    """
    rows = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = _LINE.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        c = _CYCLES.search(line)
        o = _OPNAME.search(line)
        # Operand names: the argument list runs from the op's opening paren
        # to the first closing paren (attributes like window=/metadata=
        # follow it).
        args = line[m.end():].split(")", 1)[0]
        rows.append({
            "name": name, "op": op, "shape": shape,
            "cycles": int(c.group(1)) if c else 0,
            "op_name": o.group(1) if o else "",
            "operands": re.findall(r"%([\w.\-]+)", args),
        })
    return rows


def classify(op_name: str) -> tuple[str, str]:
    """op_name -> (layer key, phase in {fwd, bwd, other}).

    jax marks reverse-mode ops with ``transpose(`` in the path; parameter
    updates and optimizer ops have no model-module component at all.
    """
    phase = "bwd" if "transpose(" in op_name else (
        "fwd" if "jvp(" in op_name or "/GVCNN/" in op_name
        or "/GoogLeNet/" in op_name else "other")
    m = _LAYER.search(op_name)
    if m:
        return m.group(1), phase
    # Fall back to the trailing path component family.
    tail = op_name.rsplit("/", 1)[-1]
    fam = re.sub(r"[\d.\[\]].*", "", tail) or "misc"
    return f"({fam})", phase


def aggregate(rows):
    per_layer = collections.defaultdict(lambda: {"fwd": 0, "bwd": 0,
                                                 "other": 0, "n": 0})
    total = 0
    for r in rows:
        layer, phase = classify(r["op_name"])
        per_layer[layer][phase] += r["cycles"]
        per_layer[layer]["n"] += 1
        total += r["cycles"]
    out = []
    for layer, d in per_layer.items():
        cyc = d["fwd"] + d["bwd"] + d["other"]
        out.append({
            "layer": layer, "cycles": cyc,
            "est_ms": round(cyc / CLOCK_HZ * 1e3, 3),
            "fwd_ms": round(d["fwd"] / CLOCK_HZ * 1e3, 3),
            "bwd_ms": round(d["bwd"] / CLOCK_HZ * 1e3, 3),
            "pct": round(100 * cyc / total, 1) if total else 0.0,
            "ops": d["n"],
        })
    out.sort(key=lambda r: -r["cycles"])
    return out, total


_DATA_MOVE_OPS = frozenset(
    {"copy", "bitcast", "convert", "transpose", "reshape", "slice",
     "dynamic-slice", "dynamic-update-slice", "concatenate", "pad",
     "copy-start", "copy-done"})
_COLLECTIVE_OPS = frozenset(
    {"all-reduce", "all-gather", "reduce-scatter", "all-to-all",
     "collective-permute", "all-reduce-start", "all-gather-start",
     "reduce-scatter-start"})


def residual_decomposition(rows):
    """Classify the scheduled step's estimated cycles into the buckets the
    marginal per-layer A/B attribution cannot see (VERDICT r3 Next #1).

    The marginal sum (tools/bench_layers.py) only captures costs that
    DISAPPEAR when a layer is ablated; shared costs — optimizer update,
    loss/head glue, input conversion, boundary copies — survive every
    ablation and show up as the whole-tower-minus-marginal-sum residual.
    This decomposes that residual from the schedule's own cost model:

      * layer_fwd / layer_bwd — ops owned by a nameable model layer (the
        part the marginal sum CAN attribute);
      * optimizer_tail — ops scheduled after the last backward op (the
        optax update + param/BN-stat writes);
      * data_movement — no-layer copy/convert/reshape-family ops
        (boundary handoffs);
      * collectives — gradient all-reduce etc.;
      * shared_other — remaining no-layer ops (loss, label one-hot,
        input normalization, RNG...), split fwd-side vs bwd-side.

    Additionally reports the fwd->bwd ACTIVATION-SAVE traffic implied by
    def-use edges that cross from a forward-phase producer to a
    backward-phase consumer: those tensors must round-trip HBM (store on
    the fwd pass, re-read on the bwd pass), which per-op marginal deltas
    under-attribute.  Bytes are logical (lower bound); ms is at the v5e
    HBM bandwidth for the store+load round trip.
    """
    last_bwd = max(
        (i for i, r in enumerate(rows)
         if classify(r["op_name"])[1] == "bwd"),
        default=-1,
    )
    buckets = collections.defaultdict(int)
    phase_of = {}
    for i, r in enumerate(rows):
        layer, phase = classify(r["op_name"])
        phase_of[r["name"]] = phase
        owned = not layer.startswith("(")
        if owned and phase in ("fwd", "bwd"):
            buckets[f"layer_{phase}"] += r["cycles"]
        elif r["op"] in _COLLECTIVE_OPS:
            buckets["collectives"] += r["cycles"]
        elif i > last_bwd >= 0:
            buckets["optimizer_tail"] += r["cycles"]
        elif r["op"] in _DATA_MOVE_OPS:
            buckets["data_movement"] += r["cycles"]
        elif owned:
            buckets["layer_other_phase"] += r["cycles"]
        else:
            buckets[f"shared_other_{phase}"] += r["cycles"]

    # fwd->bwd crossing edges: dedup per producer (one store, N reads — we
    # charge one store + one read as the round-trip lower bound).
    by_name = {r["name"]: r for r in rows}
    saved_bytes = 0
    saved_tensors = []
    seen = set()
    for r in rows:
        if phase_of.get(r["name"]) != "bwd":
            continue
        for operand in r["operands"]:
            p = by_name.get(operand)
            if p is None or operand in seen:
                continue
            if phase_of.get(operand) == "fwd":
                seen.add(operand)
                b = shape_bytes(p["shape"])
                saved_bytes += b
                saved_tensors.append(
                    (b, classify(p["op_name"])[0], operand))
    saved_tensors.sort(reverse=True)
    total = sum(r["cycles"] for r in rows)

    def ms(c):
        return round(c / CLOCK_HZ * 1e3, 3)

    return {
        "total_est_ms": ms(total),
        "buckets_ms": {k: ms(v) for k, v in
                       sorted(buckets.items(), key=lambda kv: -kv[1])},
        "shared_est_ms": ms(total - buckets["layer_fwd"]
                            - buckets["layer_bwd"]),
        "activation_save": {
            "tensors": len(saved_tensors),
            "bytes": saved_bytes,
            "mb": round(saved_bytes / 2**20, 1),
            # store (fwd) + load (bwd) at HBM bandwidth
            "roundtrip_ms": round(2 * saved_bytes / HBM_BPS * 1e3, 3),
            "top": [
                {"mb": round(b / 2**20, 1), "layer": layer, "name": n}
                for b, layer, n in saved_tensors[:12]
            ],
        },
    }


def chrome_trace(rows):
    """Complete-event ('X') timeline; one track per phase, µs timebase."""
    events = []
    tids = {"fwd": 1, "bwd": 2, "other": 3}
    t_us = 0.0
    for r in rows:
        dur = r["cycles"] / CLOCK_HZ * 1e6
        layer, phase = classify(r["op_name"])
        events.append({
            "ph": "X", "pid": 1, "tid": tids[phase],
            "ts": round(t_us, 3), "dur": round(dur, 3),
            "name": f"{layer}:{r['op']}",
            "args": {"shape": r["shape"], "cycles": r["cycles"],
                     "op_name": r["op_name"]},
        })
        t_us += dur
    meta = [
        {"ph": "M", "pid": 1, "tid": tid, "name": "thread_name",
         "args": {"name": nm}}
        for nm, tid in tids.items()
    ]
    return {"traceEvents": meta + events,
            "displayTimeUnit": "ms",
            "otherData": {"clock_hz": CLOCK_HZ,
                          "note": "XLA:TPU estimated_cycles schedule — "
                                  "serial cost model, overlap not shown"}}


def flagship_hlo(mode: str, batch: int, config: str) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.train import create_train_state, make_train_step
    from gvcnn_tf_tpu.utils import (fold_batch_norm, setup_compilation_cache,
                                    tpu_compiler_options)

    setup_compilation_cache()
    cfg = get_config(config)
    if jax.default_backend() != "tpu":
        # Same off-TPU fallback as analyze_collectives: the Pallas grouping
        # kernel has no CPU lowering, and bf16 profiles are TPU-specific.
        cfg = cfg.replace(compute_dtype="float32",
                          use_pallas_grouping=False)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=batch))
    d = cfg.data
    from gvcnn_tf_tpu.configs import resolve_transfer_dtype

    model, tx, state = create_train_state(cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    views = jnp.asarray(
        rng.rand(d.batch_size, d.num_views, d.height, d.width, 3),
        jnp.float32).astype(resolve_transfer_dtype(cfg) or jnp.float32)
    copts = tpu_compiler_options()
    if mode == "train":
        batch_data = {
            "views": views,
            "label": jnp.asarray(
                rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32),
        }
        lowered = jax.jit(make_train_step(model, tx, cfg)).lower(
            state, batch_data, jax.random.key(1))
    else:
        variables = fold_batch_norm(
            {"params": state.params, "batch_stats": state.batch_stats})
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=False)[0]
        ).lower(variables, views)
    return lowered.compile(compiler_options=copts or None).as_text()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mn40_12view")
    p.add_argument("--mode", default="train", choices=["train", "fwd"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace", default=None,
                   help="write a chrome-trace/Perfetto JSON here")
    p.add_argument("--hlo-in", default=None,
                   help="profile an existing scheduled-HLO text file "
                        "instead of compiling (offline mode)")
    p.add_argument("--residual", action="store_true",
                   help="also print the shared-cost decomposition "
                        "(optimizer/copies/loss buckets + fwd->bwd "
                        "activation-save bytes)")
    args = p.parse_args(argv)

    if args.hlo_in:
        with open(args.hlo_in) as f:
            hlo = f.read()
    else:
        hlo = flagship_hlo(args.mode, args.batch, args.config)
    rows = parse_entry(hlo)
    layers, total = aggregate(rows)
    if args.trace:
        with open(args.trace, "w") as f:
            json.dump(chrome_trace(rows), f)
    out = {
        "mode": args.mode,
        "scheduled_ops": len(rows),
        "total_estimated_cycles": total,
        "estimated_step_ms": round(total / CLOCK_HZ * 1e3, 2),
        "layers_top": layers[: args.top],
        "trace": args.trace,
    }
    if args.residual:
        out["residual"] = residual_decomposition(rows)
    print(json.dumps(out, indent=1))
    return layers


if __name__ == "__main__":
    main()
