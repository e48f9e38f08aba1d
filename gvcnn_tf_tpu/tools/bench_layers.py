"""Per-layer TPU performance attribution for the backbones.

`jax.profiler.start_trace` hangs under this container's remote axon PJRT
plugin (see utils/profiling.py), so per-op attribution is blind.  This tool
works around it with DELTA TIMING: compile + time the backbone truncated at
every endpoint, then attribute layer i the difference t(E_i) - t(E_{i-1})
and the XLA-cost-analysis FLOP/byte deltas.  From those it derives each
layer's attained FLOP/s, its arithmetic intensity, and its roofline bound
min(peak, intensity * HBM_BW) — i.e. how much of the gap is physics vs
implementation.

Usage (real chip):

    python -m gvcnn_tf_tpu.tools.bench_layers --backbone inception_v1 \
        --batch 384 --height 224 --mode train --out docs/PERF_LAYERS.md

`--batch 384` = 32 shapes x 12 views, the flagship folded batch (B3).
`--mode train` times forward+backward (value_and_grad of a sum loss);
`--mode fwd` forward only.  Writes a markdown table and prints JSON lines.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu.models.backbones import get_backbone

# Peak specs by device kind: (bf16 dense FLOP/s, HBM bytes/s).
_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),
}


def device_peaks():
    kind = jax.devices()[0].device_kind
    for k, v in _PEAKS.items():
        if kind.startswith(k):
            return v
    return (197e12, 819e9) if jax.default_backend() == "tpu" else (1e12, 1e11)


def _time_fn(fn, args, iters: int, chunk: int = 5) -> float:
    """Median seconds/call; syncs by device_get of a scalar (axon-safe)."""
    out = fn(*args)
    scalar = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(scalar).astype(jnp.float32)))
    samples = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = fn(*args)
        s = jax.tree.leaves(out)[0]
        float(jax.device_get(jnp.sum(s).astype(jnp.float32)))
        samples.append((time.perf_counter() - t0) / chunk)
    samples.sort()
    return samples[len(samples) // 2]


def bench_endpoint(
    backbone: str,
    endpoint: str,
    *,
    batch: int,
    height: int,
    width: int,
    dtype: str,
    mode: str,
    iters: int,
    merge: str = "none",
    s2d: bool = False,
):
    """-> dict(t, flops, bytes) for the backbone truncated at `endpoint`."""
    cls = get_backbone(backbone)
    fields = getattr(cls, "__dataclass_fields__", {})
    kw = {}
    if merge != "none" and "merge_branches" in fields:
        kw["merge_branches"] = merge
    if s2d and "stem_space_to_depth" in fields:
        kw["stem_space_to_depth"] = True
    model = cls(final_endpoint=endpoint, dtype=jnp.dtype(dtype),
                bn_momentum=0.9, **kw)
    x = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x
    )
    params, bn = variables["params"], variables.get("batch_stats", {})

    if mode == "fwd":
        def fn(p, x):
            feats, _ = model.apply(
                {"params": p, "batch_stats": bn}, x, train=False
            )
            return feats
        args = (params, x)
    else:  # train: forward + backward through the truncated tower
        def loss_fn(p, x):
            (feats, _), _ = model.apply(
                {"params": p, "batch_stats": bn}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(feats.astype(jnp.float32))

        def fn(p, x):
            return jax.value_and_grad(loss_fn)(p, x)
        args = (params, x)

    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    cost = lowered.compile().cost_analysis() or {}
    t = _time_fn(jitted, args, iters)
    return {
        "t": t,
        "flops": float(cost.get("flops", 0.0)),
        "bytes": float(cost.get("bytes accessed", 0.0)),
    }


def run(
    backbone: str = "inception_v1",
    *,
    batch: int = 384,
    height: int = 224,
    width: int = 224,
    dtype: str = "bfloat16",
    mode: str = "train",
    iters: int = 10,
    endpoints: Optional[list] = None,
    out: Optional[str] = None,
    merge: str = "none",
    s2d: bool = False,
):
    peak_flops, peak_bw = device_peaks()
    cls = get_backbone(backbone)
    eps = list(endpoints or cls.ENDPOINTS)

    rows = []
    prev = {"t": 0.0, "flops": 0.0, "bytes": 0.0}
    for ep in eps:
        cur = bench_endpoint(
            backbone, ep, batch=batch, height=height, width=width,
            dtype=dtype, mode=mode, iters=iters, merge=merge, s2d=s2d,
        )
        dt = cur["t"] - prev["t"]
        dflops = cur["flops"] - prev["flops"]
        dbytes = cur["bytes"] - prev["bytes"]
        attained = dflops / dt if dt > 0 else 0.0
        intensity = dflops / dbytes if dbytes > 0 else 0.0
        bound = min(peak_flops, intensity * peak_bw)
        row = {
            "endpoint": ep,
            "cum_ms": round(cur["t"] * 1e3, 3),
            "ms": round(dt * 1e3, 3),
            "gflops": round(dflops / 1e9, 2),
            "attained_tflops": round(attained / 1e12, 2),
            "frac_peak": round(attained / peak_flops, 4),
            "intensity": round(intensity, 1),
            "roofline_bound_tflops": round(bound / 1e12, 2),
            "frac_of_bound": round(attained / bound, 4) if bound > 0 else 0.0,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        prev = cur

    total_t = prev["t"]
    total_flops = prev["flops"]
    summary = {
        "backbone": backbone, "mode": mode, "batch": batch,
        "height": height, "dtype": dtype,
        "total_ms": round(total_t * 1e3, 2),
        "total_gflops": round(total_flops / 1e9, 1),
        "mfu": round(total_flops / total_t / peak_flops, 4),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps({"summary": summary}), flush=True)

    if out:
        lines = [
            f"# Per-layer timing: {backbone} {mode} "
            f"(batch {batch}, {height}x{width}, {dtype}, "
            f"{summary['device']})",
            "",
            "Delta timing between truncated towers; FLOPs/bytes from XLA "
            "cost analysis. `frac_of_bound` = attained / min(peak, "
            "intensity*BW) — how close each layer is to ITS OWN roofline.",
            "",
            "| endpoint | ms | GFLOP | TFLOP/s | frac peak | intensity "
            "(FLOP/B) | bound TFLOP/s | frac of bound |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['endpoint']} | {r['ms']} | {r['gflops']} | "
                f"{r['attained_tflops']} | {r['frac_peak']} | "
                f"{r['intensity']} | {r['roofline_bound_tflops']} | "
                f"{r['frac_of_bound']} |"
            )
        lines += [
            "",
            f"Total: {summary['total_ms']} ms, "
            f"{summary['total_gflops']} GFLOP, MFU {summary['mfu']}.",
            "",
        ]
        with open(out, "a") as f:
            f.write("\n".join(lines) + "\n")
    return rows, summary


def main(argv=None):
    p = argparse.ArgumentParser(description="per-layer TPU timing harness")
    p.add_argument("--backbone", default="inception_v1")
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mode", default="train", choices=["train", "fwd"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--endpoints", default=None,
                   help="comma-separated subset (default: all)")
    p.add_argument("--merge", default="none",
                   choices=["none", "1x1", "full"],
                   help="merge_branches layout variant to attribute")
    p.add_argument("--s2d", action="store_true",
                   help="use the space-to-depth stem")
    p.add_argument("--out", default=None, help="append markdown table here")
    args = p.parse_args(argv)
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    run(
        args.backbone, batch=args.batch, height=args.height,
        width=args.width, dtype=args.dtype, mode=args.mode,
        iters=args.iters,
        endpoints=args.endpoints.split(",") if args.endpoints else None,
        out=args.out,
        merge=args.merge,
        s2d=args.s2d,
    )


if __name__ == "__main__":
    main()
