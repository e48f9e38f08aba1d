"""Benchmark the Pallas stem kernel vs XLA's conv lowering on the chip.

    python -m gvcnn_tf_tpu.tools.bench_stem --batch 384 --height 224

Prints JSON lines: XLA conv fwd, Pallas fwd, max deviation, and (with
--train) the full train-step effect of stem_pallas on the flagship config.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(f, *args, iters=20, chunk=5):
    out = f(*args)
    float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
    ts = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = f(*args)
        float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / chunk)
    ts.sort()
    return ts[len(ts) // 2]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--train", action="store_true",
                   help="also time the flagship train step with/without "
                        "stem_pallas")
    args = p.parse_args(argv)

    from gvcnn_tf_tpu.ops.pallas_stem import (
        _stem_fwd,
        stem_conv,
        stem_conv_reference,
    )
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    r = np.random.RandomState(0)
    x = jnp.asarray(
        r.rand(args.batch, args.height, args.height, 3), jnp.float32
    )
    k = jnp.asarray(r.randn(7, 7, 3, 64) * 0.05, jnp.float32)

    ref_fn = jax.jit(stem_conv_reference)
    if jax.default_backend() == "tpu":
        pal_fn = jax.jit(stem_conv)
    else:  # interpret-mode fallback so the tool runs anywhere
        pal_fn = lambda a, b: _stem_fwd(a, b, interpret=True)

    t_ref = _timeit(ref_fn, x, k, iters=args.iters)
    t_pal = _timeit(pal_fn, x, k, iters=args.iters)
    ref = np.asarray(ref_fn(x, k), np.float32)
    pal = np.asarray(pal_fn(x, k), np.float32)
    dev = float(np.max(np.abs(ref - pal)))
    scale = float(np.max(np.abs(ref)) + 1e-9)
    print(json.dumps({
        "op": "stem7x7s2", "batch": args.batch, "height": args.height,
        "xla_ms": round(t_ref * 1e3, 3),
        "pallas_ms": round(t_pal * 1e3, 3),
        "speedup": round(t_ref / t_pal, 3),
        "max_abs_dev": dev, "rel_dev": dev / scale,
    }), flush=True)

    if args.train:
        import dataclasses

        from gvcnn_tf_tpu.configs import get_config
        from gvcnn_tf_tpu.tools.bench_variants import time_variant

        base = get_config("mn40_12view")
        for name, cfg in [
            ("merge_1x1", base),
            ("merge_1x1+stem_pallas", base.replace(stem_pallas=True)),
        ]:
            dt, flops = time_variant(cfg, args.batch // 12,
                                     iters=args.iters)
            print(json.dumps({
                "variant": name, "step_ms": round(dt * 1e3, 2),
                "views_per_sec": round(args.batch / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
