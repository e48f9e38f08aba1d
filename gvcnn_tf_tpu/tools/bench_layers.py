"""Per-layer TPU performance attribution for the backbones.

`jax.profiler.start_trace` hangs under this container's remote axon PJRT
plugin (see utils/profiling.py), so per-op attribution is blind.  Two
methods fill the gap:

**marginal (default, round 3 — noise-free)**: for each layer i, time TWO
programs that differ ONLY by one extra execution of layer i:
  A: loss(seg_i(prefix_{i-1}(x), params_s))
  B: loss(seg_i(z, params_s)) + loss(seg_i(z, params_s2)),  z shared
params_s2 is an independent argument with identical values, so XLA cannot
CSE the second copy, and both programs share the identical prefix
computation and input layout.  delta = t(B) - t(A) is the marginal
in-context cost of layer i (fwd, or fwd+bwd in train mode) and is
non-negative by construction up to timing jitter; the harness reports
per-pair error bars (std over timing chunks) and flags any |delta| < 2
sigma.  The round-2 truncated-tower method produced negative deltas up to
-17.8 ms and frac_of_bound up to 2.09 because separately-compiled towers
make different layout choices; it remains available as --method truncated
for comparison.

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
    return _time_fn_stats(fn, args, iters, chunk)[0]


def _time_fn_stats(fn, args, iters: int, chunk: int = 5):
    """-> (median, std) seconds/call over timing chunks.

    Syncs by device_get of a scalar — `block_until_ready` is NOT a real
    sync under the remote axon plugin.  The per-chunk dispatch round-trip
    (~1.5 ms measured) amortizes over `chunk` calls and cancels exactly in
    A/B marginal deltas (both sides pay it identically).
    """
    out = fn(*args)
    scalar = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(scalar).astype(jnp.float32)))
    samples = []
    for _ in range(max(iters // chunk, 4)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = fn(*args)
        s = jax.tree.leaves(out)[0]
        float(jax.device_get(jnp.sum(s).astype(jnp.float32)))
        samples.append((time.perf_counter() - t0) / chunk)
    med = sorted(samples)[len(samples) // 2]
    mean = sum(samples) / len(samples)
    var = sum((s - mean) ** 2 for s in samples) / max(len(samples) - 1, 1)
    return med, var ** 0.5


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

    from gvcnn_tf_tpu.utils import tpu_compiler_options

    jitted = jax.jit(fn, compiler_options=tpu_compiler_options())
    lowered = jitted.lower(*args)
    cost = lowered.compile().cost_analysis() or {}
    t = _time_fn(jitted, args, iters)
    return {
        "t": t,
        "flops": float(cost.get("flops", 0.0)),
        "bytes": float(cost.get("bytes accessed", 0.0)),
    }


def _make_models(backbone, final, start, dtype, merge, s2d):
    cls = get_backbone(backbone)
    fields = getattr(cls, "__dataclass_fields__", {})
    if start and "start_endpoint" not in fields:
        raise ValueError(
            f"{backbone} does not support segment towers (start_endpoint)")
    kw = {}
    if merge != "none" and "merge_branches" in fields:
        kw["merge_branches"] = merge
    if s2d and "stem_space_to_depth" in fields:
        kw["stem_space_to_depth"] = True
    if start:
        kw["start_endpoint"] = start
    return cls(final_endpoint=final, dtype=jnp.dtype(dtype),
               bn_momentum=0.9, **kw)


def bench_marginal_pair(
    backbone: str,
    endpoint: str,
    prev_endpoint: str,
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
    """Marginal in-context cost of the (prev_endpoint, endpoint] segment.

    -> dict(dt, sigma, flops, bytes): dt = t(prefix + 2x segment) -
    t(prefix + 1x segment); flops/bytes are the same A/B difference of
    XLA cost analysis, i.e. exactly one segment execution's worth.

    The second copy reads a SEPARATE device-resident argument z2 (not the
    prefix output z) and z2's gradient is requested in train mode.  Both
    are load-bearing: with shared z, a parameterless segment (the pools)
    is CSE'd away entirely and measures ~0; and without dz2 the second
    pool's backward (the select-and-scatter being attributed) is dead
    code.  The cost of materializing dz2 as a program output is part of
    the true backward (in-context the same cotangent feeds the prefix).
    Exception: for the FIRST layer (prev_endpoint == "") dz2 is NOT
    requested — in-context the model input needs no gradient, so the
    first layer never computes a data-gradient conv, and requesting it
    here would bill the stem for a conv it does not run (measured: it
    more than doubled the stem row).
    """
    x = jnp.zeros((batch, height, width, 3), jnp.float32)

    if prev_endpoint:
        prefix = _make_models(backbone, prev_endpoint, "", dtype, merge, s2d)
        pvars = jax.jit(functools.partial(prefix.init, train=False))(
            {"params": jax.random.key(0)}, x)
        z_shape = jax.eval_shape(
            functools.partial(prefix.apply, train=False), pvars, x)[0]
        seg = _make_models(backbone, endpoint, prev_endpoint, dtype, merge,
                           s2d)
        z0 = jnp.zeros(z_shape.shape, z_shape.dtype)
    else:
        prefix, pvars = None, {"params": {}}
        seg = _make_models(backbone, endpoint, "", dtype, merge, s2d)
        z0 = x
    svars = jax.jit(functools.partial(seg.init, train=False))(
        {"params": jax.random.key(1)}, z0)
    sp = svars.get("params", {})
    sbn = svars.get("batch_stats", {})
    pp = pvars.get("params", {})
    pbn = pvars.get("batch_stats", {})
    train = mode == "train"

    def seg_apply(s, z):
        if train:
            (feats, _), _ = seg.apply(
                {"params": s, "batch_stats": sbn}, z, train=True,
                mutable=["batch_stats"])
        else:
            feats, _ = seg.apply(
                {"params": s, "batch_stats": sbn}, z, train=False)
        return jnp.sum(feats.astype(jnp.float32))

    def tower(pp_, x_, s1):
        if prefix is not None:
            if train:
                (z, _), _ = prefix.apply(
                    {"params": pp_, "batch_stats": pbn}, x_, train=True,
                    mutable=["batch_stats"])
            else:
                z, _ = prefix.apply(
                    {"params": pp_, "batch_stats": pbn}, x_, train=False)
        else:
            z = x_
        return seg_apply(s1, z)

    sp2 = jax.tree.map(lambda a: a.copy(), sp)
    rng = np.random.RandomState(0)
    z2 = jnp.asarray(rng.randn(*z0.shape).astype(np.float32),
                     getattr(z0, "dtype", jnp.float32))

    def fa(pp_, s1, x_, s2, z2_):
        return tower(pp_, x_, s1)

    def fb(pp_, s1, x_, s2, z2_):
        return tower(pp_, x_, s1) + seg_apply(s2, z2_)

    from gvcnn_tf_tpu.utils import tpu_compiler_options

    copts = tpu_compiler_options()
    if train:
        b_argnums = (0, 1, 3, 4) if prev_endpoint else (0, 1, 3)
        fn_a = jax.jit(jax.grad(fa, argnums=(0, 1)), compiler_options=copts)
        fn_b = jax.jit(jax.grad(fb, argnums=b_argnums),
                       compiler_options=copts)
    else:
        fn_a = jax.jit(fa, compiler_options=copts)
        fn_b = jax.jit(fb, compiler_options=copts)
    args_a = (pp, sp, x, sp2, z2)
    args_b = (pp, sp, x, sp2, z2)

    def cost(fn, args):
        c = fn.lower(*args).compile().cost_analysis() or {}
        return (float(c.get("flops", 0.0)),
                float(c.get("bytes accessed", 0.0)))

    fa, ba = cost(fn_a, args_a)
    fb, bb = cost(fn_b, args_b)
    ta, sa = _time_fn_stats(fn_a, args_a, iters)
    tb, sb = _time_fn_stats(fn_b, args_b, iters)
    return {
        "dt": tb - ta,
        "sigma": (sa ** 2 + sb ** 2) ** 0.5,
        "flops": fb - fa,
        "bytes": bb - ba,
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
    method: str = "marginal",
):
    peak_flops, peak_bw = device_peaks()
    cls = get_backbone(backbone)
    eps = list(endpoints or cls.ENDPOINTS)

    rows = []
    if method == "marginal" and "start_endpoint" not in getattr(
            cls, "__dataclass_fields__", {}):
        print(json.dumps({"note": f"{backbone} has no start_endpoint "
                          "segment support; falling back to --method "
                          "truncated"}), flush=True)
        method = "truncated"
    if method == "marginal":
        all_eps = list(cls.ENDPOINTS)
        for ep in eps:
            i = all_eps.index(ep)
            prev_ep = all_eps[i - 1] if i > 0 else ""
            m = bench_marginal_pair(
                backbone, ep, prev_ep, batch=batch, height=height,
                width=width, dtype=dtype, mode=mode, iters=iters,
                merge=merge, s2d=s2d,
            )
            dt, dflops, dbytes = m["dt"], m["flops"], m["bytes"]
            attained = dflops / dt if dt > 0 else 0.0
            intensity = dflops / dbytes if dbytes > 0 else 0.0
            bound = min(peak_flops, intensity * peak_bw)
            row = {
                "endpoint": ep,
                "ms": round(dt * 1e3, 3),
                "sigma_ms": round(m["sigma"] * 1e3, 3),
                "noisy": bool(abs(dt) < 2 * m["sigma"]),
                "gflops": round(dflops / 1e9, 2),
                "attained_tflops": round(attained / 1e12, 2),
                "frac_peak": round(attained / peak_flops, 4),
                "intensity": round(intensity, 1),
                "roofline_bound_tflops": round(bound / 1e12, 2),
                "frac_of_bound": (
                    round(attained / bound, 4) if bound > 0 else 0.0),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        # Whole-tower time/FLOPs for the summary (one program, all layers).
        last = bench_endpoint(
            backbone, eps[-1], batch=batch, height=height, width=width,
            dtype=dtype, mode=mode, iters=iters, merge=merge, s2d=s2d,
        )
        total_t, total_flops = last["t"], last["flops"]
    else:
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
                "frac_of_bound": (
                    round(attained / bound, 4) if bound > 0 else 0.0),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            prev = cur
        total_t = prev["t"]
        total_flops = prev["flops"]
    summary = {
        "backbone": backbone, "mode": mode, "batch": batch,
        "height": height, "dtype": dtype, "method": method,
        "total_ms": round(total_t * 1e3, 2),
        "total_gflops": round(total_flops / 1e9, 1),
        "mfu": round(total_flops / total_t / peak_flops, 4),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps({"summary": summary}), flush=True)

    if out:
        if method == "marginal":
            desc = ("Marginal A/B pairs (prefix+1x vs prefix+2x segment, "
                    "identical programs otherwise): non-negative by "
                    "construction; `sigma` = per-pair timing std; rows "
                    "with |delta| < 2 sigma are marked noisy. ")
            hdr = ("| endpoint | ms | sigma | GFLOP | TFLOP/s | frac peak "
                   "| intensity (FLOP/B) | bound TFLOP/s | frac of bound |")
            sep = "|---|---|---|---|---|---|---|---|---|"
        else:
            desc = "Delta timing between truncated towers. "
            hdr = ("| endpoint | ms | GFLOP | TFLOP/s | frac peak | "
                   "intensity (FLOP/B) | bound TFLOP/s | frac of bound |")
            sep = "|---|---|---|---|---|---|---|---|"
        lines = [
            f"# Per-layer timing: {backbone} {mode} "
            f"(batch {batch}, {height}x{width}, {dtype}, "
            f"{summary['device']}, method={method})",
            "",
            desc + "FLOPs/bytes from XLA cost analysis. `frac_of_bound` = "
            "attained / min(peak, intensity*BW) — how close each layer is "
            "to ITS OWN roofline.",
            "",
            hdr,
            sep,
        ]
        for r in rows:
            if method == "marginal":
                sig = f"{r['sigma_ms']}" + (" (noisy)" if r["noisy"] else "")
                lines.append(
                    f"| {r['endpoint']} | {r['ms']} | {sig} | "
                    f"{r['gflops']} | {r['attained_tflops']} | "
                    f"{r['frac_peak']} | {r['intensity']} | "
                    f"{r['roofline_bound_tflops']} | {r['frac_of_bound']} |"
                )
            else:
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
    p.add_argument("--method", default="marginal",
                   choices=["marginal", "truncated"],
                   help="marginal = noise-free A/B pairs (default); "
                        "truncated = round-2 cumulative-delta method")
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
        method=args.method,
    )


if __name__ == "__main__":
    main()
