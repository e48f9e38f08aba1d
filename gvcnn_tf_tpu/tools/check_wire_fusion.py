"""Does the uint8 wire's on-device normalize FUSE, or materialize a copy?

VERDICT r4 Next #4: `transfer_dtype="uint8"` ships raw bytes and runs
`utils.normalize_views` inside the jitted step; the docstring claim that
XLA fuses the `u8 -> f32 -> *a+b` chain into the stem convolution's input
processing (utils/images.py) was never verified on the TPU toolchain.
This tool answers it from the OPTIMIZED HLO, the same compile-time-fact
approach as tools/analyze_collectives and tools/dump_hlo:

  1. compile the production train step twice — uint8 wire vs a float
     reference wire (bf16 by default, the production transfer dtype);
  2. list every ENTRY-level instruction that MATERIALIZES a views-sized
     float buffer (elements within [1.0, 2.2] x B*V*H*W*3 — wide enough
     for a padded stem input, narrow enough to exclude the 5.3x-larger
     stem output);
  3. verdict: the uint8 wire is fused iff it materializes NO MORE such
     buffers than the float wire (a separate normalize pass would add a
     ~58 MB f32 write + read that the float wire does not have).

Compile-only — nothing executes; run it against the TPU backend for the
production answer (CPU schedules materialize differently).

    python -m gvcnn_tf_tpu.tools.check_wire_fusion --batch 32 [--ref bf16]

Prints one JSON object with both programs' materialization tables and the
verdict.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import re

import jax
import jax.numpy as jnp

_FLOAT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8}
# ENTRY-level opcodes that do not write a new HBM buffer.
_FREE_OPS = {"parameter", "bitcast", "get-tuple-element", "tuple",
             "constant", "after-all"}


def _rhs_shape_and_op(rhs: str):
    """'bf16[1,2]{1,0} fusion(...)' / '(f32[..], u32[]) all-reduce(..)'
    -> (shape_text, opcode) or None."""
    rhs = rhs.strip()
    if rhs.startswith("("):
        depth = 0
        for i, ch in enumerate(rhs):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0:
                shape, rest = rhs[: i + 1], rhs[i + 1 :]
                break
        else:
            return None
    else:
        parts = rhs.split(None, 1)
        if len(parts) != 2:
            return None
        shape, rest = parts
    m = re.match(r"\s*([\w-]+)\(", rest)
    return (shape, m.group(1)) if m else None


def _float_elem_counts(shape_text: str):
    """All float tensor element counts inside a (possibly tuple) shape."""
    out = []
    for dtype, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_text):
        if dtype not in _FLOAT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((dtype, n))
    return out


def entry_materializations(hlo: str, lo: int, hi: int):
    """ENTRY-level instructions materializing a float buffer with element
    count in [lo, hi].  Fused-computation bodies don't write HBM, so only
    the ENTRY block is scanned."""
    m = re.search(r"^ENTRY [^\n]*\{$(.*?)^\}", hlo, re.M | re.S)
    if not m:  # some dumps leave ENTRY unannotated on the main computation
        raise ValueError("no ENTRY computation found in HLO text")
    rows = []
    for line in m.group(1).splitlines():
        line = line.strip()
        if "=" not in line:
            continue
        name, rhs = line.split("=", 1)
        parsed = _rhs_shape_and_op(rhs)
        if parsed is None:
            continue
        shape, op = parsed
        if op in _FREE_OPS:
            continue
        for dtype, n in _float_elem_counts(shape):
            if lo <= n <= hi:
                rows.append({
                    "name": name.strip().lstrip("%"),
                    "op": op,
                    "dtype": dtype,
                    "elements": n,
                    "mb": round(n * _FLOAT_BYTES[dtype] / 1e6, 1),
                })
    return rows


def step_hlo(config, wire_dtype: str, batch: int) -> str:
    """Optimized HLO text of the jitted production train step at the
    given wire dtype (the dtype of the views argument)."""
    from gvcnn_tf_tpu.train import create_train_state, make_train_step
    from gvcnn_tf_tpu.utils import tpu_compiler_options

    cfg = config.replace(
        data=dataclasses.replace(config.data, batch_size=batch,
                                 transfer_dtype=wire_dtype))
    d = cfg.data
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    shape = (d.batch_size, d.num_views, d.height, d.width, 3)
    views = jax.ShapeDtypeStruct(
        shape, jnp.uint8 if wire_dtype == "uint8" else jnp.dtype(wire_dtype))
    labels = jax.ShapeDtypeStruct((d.batch_size,), jnp.int32)
    step = jax.jit(make_train_step(model, tx, cfg),
                   compiler_options=tpu_compiler_options())
    compiled = step.lower(
        state, {"views": views, "label": labels}, jax.random.key(1)
    ).compile()
    return compiled.as_text()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mn40_12view")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ref", default="bfloat16",
                   help="float wire to compare against (production: bf16)")
    p.add_argument("--merge", default="1x1")
    p.add_argument("--height", type=int, default=None,
                   help="override geometry (tests; production = config's)")
    p.add_argument("--views", type=int, default=None)
    args = p.parse_args(argv)

    from gvcnn_tf_tpu.configs import get_config

    cfg = get_config(args.config).replace(
        merge_inception_branches=args.merge)
    if args.height or args.views:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data,
            height=args.height or cfg.data.height,
            width=args.height or cfg.data.width,
            num_views=args.views or cfg.data.num_views))
    d = cfg.data
    full = args.batch * d.num_views * d.height * d.width * 3
    lo, hi = full, int(2.2 * full)

    report = {"backend": jax.default_backend(),
              "views_elements": full, "window": [lo, hi]}
    counts = {}
    for wire in (args.ref, "uint8"):
        rows = entry_materializations(step_hlo(cfg, wire, args.batch),
                                      lo, hi)
        counts[wire] = len(rows)
        report[f"wire_{wire}"] = rows
    extra = counts["uint8"] - counts[args.ref]
    report["uint8_extra_materializations"] = extra
    report["verdict"] = (
        "FUSED: the uint8 wire materializes no extra views-sized float "
        "buffer — normalize_views rides the stem's input fusion"
        if extra <= 0 else
        f"NOT FUSED: uint8 wire materializes {extra} extra views-sized "
        "float buffer(s) — normalize is a separate HBM pass")
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
