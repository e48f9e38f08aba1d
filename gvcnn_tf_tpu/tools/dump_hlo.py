"""Dump optimized HLO for a backbone segment and summarize layout traffic.

VERDICT r2 Next #3: attack the Mixed-block over-bound gap "with HLO
evidence".  This tool compiles one segment (e.g. just Mixed_3b, via the
backbone's start_endpoint support) in fwd or train mode and reports, from
the OPTIMIZED (post-layout, post-fusion) HLO:

  * op-kind histogram (fusion/copy/transpose/reshape/concatenate/...)
  * every copy/transpose/bitcast-convert with its shape and byte count —
    the relayout traffic the roofline never asked for
  * concatenate ops with operand shapes (is the concat a no-op layout?)

Usage (real chip; compile-only, nothing is executed):

    python -m gvcnn_tf_tpu.tools.dump_hlo --endpoint Mixed_3b \
        --batch 384 --mode train --merge 1x1 [--full-hlo out.txt]
"""

from __future__ import annotations

import argparse
import collections
import functools
import json
import re

import jax
import jax.numpy as jnp
import numpy as np


def _bytes_of(shape_str: str) -> int:
    """'bf16[384,28,28,96]{...}' (or a tuple of such) -> total bytes."""
    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
             "u8": 1, "f16": 2, "s64": 8, "u64": 8}
    total = 0
    for dtype, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sizes.get(dtype, 4)
    return total


def segment_hlo(
    backbone: str,
    endpoint: str,
    start_endpoint: str,
    *,
    batch: int,
    height: int,
    width: int,
    mode: str,
    merge: str = "none",
):
    """-> optimized HLO text for the segment program."""
    from gvcnn_tf_tpu.tools.bench_layers import _make_models

    model = _make_models(backbone, endpoint, start_endpoint, "bfloat16",
                         merge, False)
    if start_endpoint:
        from gvcnn_tf_tpu.models.backbones import get_backbone

        cls = get_backbone(backbone)
        chans = cls.ENDPOINT_CHANNELS[start_endpoint]
        # Spatial size of the intermediate: infer by shape-evaluating the
        # prefix once (cheap, abstract only).
        prefix = _make_models(backbone, start_endpoint, "", "bfloat16",
                              merge, False)
        pv = jax.eval_shape(
            functools.partial(prefix.init, train=False),
            {"params": jax.random.key(0)},
            jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32))
        z = jax.eval_shape(
            functools.partial(prefix.apply, train=False), pv,
            jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32))[0]
        x = jnp.zeros(z.shape, z.dtype)
        assert x.shape[-1] == chans
    else:
        x = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(1)}, x)
    params = variables.get("params", {})
    bn = variables.get("batch_stats", {})

    if mode == "train":
        def loss(p, x_):
            (f, _), _ = model.apply(
                {"params": p, "batch_stats": bn}, x_, train=True,
                mutable=["batch_stats"])
            return jnp.sum(f.astype(jnp.float32))

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(lambda p, x_: model.apply(
            {"params": p, "batch_stats": bn}, x_, train=False)[0])
    compiled = fn.lower(params, x).compile()
    return compiled.as_text()


def summarize(hlo: str) -> dict:
    """Parse the scheduled-HLO entry computation (`%name = shape op(...)`
    lines, with TPU backend_config `estimated_cycles` on each)."""
    ops = collections.Counter()
    relayout = []
    concats = []
    ranked = []
    total_cycles = 0
    for line in hlo.splitlines():
        # Result type is a single shape or a (tuple, of, shapes) — the
        # latter is the dominant case for train-mode fusions (BN grads),
        # and contains spaces (code-review r3).
        m = re.match(
            r"\s*(?:ROOT )?%([\w.\-]+) = "
            r"(\([^)]*\)|\S+?\[[^\]]*\]\S*) ([a-z\-]+)\(",
            line)
        if not m:
            continue
        name, shape, op = m.groups()
        ops[op] += 1
        c = re.search(r'"estimated_cycles":"(\d+)"', line)
        cycles = int(c.group(1)) if c else 0
        total_cycles += cycles
        ranked.append({"op": op, "name": name, "shape": shape,
                       "cycles": cycles})
        if op in ("copy", "transpose", "bitcast-convert"):
            relayout.append({"op": op, "shape": shape, "cycles": cycles,
                             "mbytes": round(_bytes_of(shape) / 1e6, 1)})
        if op == "concatenate":
            concats.append({"shape": shape,
                            "mbytes": round(_bytes_of(shape) / 1e6, 1)})
    relayout.sort(key=lambda r: -r["mbytes"])
    ranked.sort(key=lambda r: -r["cycles"])
    copy_mb = sum(r["mbytes"] for r in relayout if r["op"] == "copy")
    return {
        "op_histogram": dict(ops.most_common()),
        # Materialized (unfused) relayout + concat traffic — if these
        # lists are empty/tiny, layout is NOT where the time goes.
        "relayout_top": relayout[:20],
        "copy_mbytes_total": round(copy_mb, 1),
        "concatenates": concats,
        # XLA's own per-op cycle estimates, largest first.
        "total_estimated_cycles": total_cycles,
        "estimated_ms_at_940mhz": round(total_cycles / 0.94e9 * 1e3, 3),
        "top_by_cycles": ranked[:15],
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", default="inception_v1")
    p.add_argument("--endpoint", default="Mixed_3b")
    p.add_argument("--start", default=None,
                   help="start endpoint (default: the one before "
                        "--endpoint)")
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--mode", default="train", choices=["train", "fwd"])
    p.add_argument("--merge", default="none",
                   choices=["none", "1x1", "full"])
    p.add_argument("--full-hlo", default=None,
                   help="write the complete optimized HLO here")
    args = p.parse_args(argv)

    from gvcnn_tf_tpu.models.backbones import get_backbone
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    if args.start is None:
        eps = list(get_backbone(args.backbone).ENDPOINTS)
        i = eps.index(args.endpoint)
        args.start = eps[i - 1] if i > 0 else ""
    hlo = segment_hlo(
        args.backbone, args.endpoint, args.start, batch=args.batch,
        height=args.height, width=args.width, mode=args.mode,
        merge=args.merge,
    )
    if args.full_hlo:
        with open(args.full_hlo, "w") as f:
            f.write(hlo)
    print(json.dumps(summarize(hlo), indent=1))


if __name__ == "__main__":
    main()
