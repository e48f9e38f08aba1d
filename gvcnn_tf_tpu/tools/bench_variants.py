"""Sweep flagship train-step time across layout/config variants on TPU.

Companion to tools/bench_layers.py (per-layer attribution): this answers
"which exact-math layout knobs actually move the step" — space-to-depth
stem, merged Inception branches, remat, Pallas grouping, batch size — by
timing the REAL jitted train step for each variant.

Usage:

    python -m gvcnn_tf_tpu.tools.bench_variants --batch 32 \
        --out docs/PERF_VARIANTS.md

Prints one JSON line per variant; optionally appends a markdown table.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_variant(cfg, batch: int, iters: int = 30, chunk: int = 10):
    """-> (median step seconds, XLA-counted step FLOPs).

    Views are fed at the config's resolved transfer dtype (the same bytes
    the prefetch layer ships), so `transfer_dtype` variants measure the
    REAL wire format end to end: uint8 rows exercise the on-device
    `normalize_views` path inside the jitted step (utils/images.py).
    """
    from gvcnn_tf_tpu.train import create_train_state, make_train_step

    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=batch)
    )
    d = cfg.data
    from gvcnn_tf_tpu.utils import tpu_compiler_options

    copts = tpu_compiler_options()
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0,
                   compiler_options=copts)

    rng = np.random.RandomState(0)
    from gvcnn_tf_tpu.configs import resolve_transfer_dtype

    shape = (d.batch_size, d.num_views, d.height, d.width, 3)
    if d.transfer_dtype == "uint8":
        # Raw wire bytes: the dataset layer yields uint8 and the jitted
        # step normalizes on device (resolve_transfer_dtype returns None
        # here because the PREFETCH layer does no cast).
        views = jnp.asarray(rng.randint(0, 256, size=shape), jnp.uint8)
    else:
        wire = resolve_transfer_dtype(cfg) or jnp.float32
        views = jnp.asarray(rng.rand(*shape), jnp.float32).astype(wire)
    labels = jnp.asarray(
        rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32
    )
    batch_data = {"views": views, "label": labels}
    key = jax.random.key(1)

    try:
        cost = (
            jax.jit(make_train_step(model, tx, cfg),
                    compiler_options=copts)
            .lower(state, batch_data, key).compile().cost_analysis()
        ) or {}
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0

    for _ in range(3):
        state, mets = step(state, batch_data, key)
    float(jax.device_get(mets["loss"]))
    samples = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, mets = step(state, batch_data, key)
        float(jax.device_get(mets["loss"]))
        samples.append((time.perf_counter() - t0) / chunk)
    samples.sort()
    return samples[len(samples) // 2], flops


# (name, config overrides) — all exact-math layout knobs.  Every variant
# pins EVERY knob explicitly (ADVICE r2): the production config default is
# merge_inception_branches="1x1", so an empty-override "baseline" would
# already run merged and each row's speedup would conflate the merge knob
# into whatever its name claims to measure.
_PINNED = {"stem_space_to_depth": False, "merge_inception_branches": "none",
           "remat_backbone": False, "use_pallas_grouping": False,
           "remat_until": "",
           # float32 feed pinned for every legacy variant: r2/r3 rows were
           # measured with an f32 feed, and within-sweep deltas must not
           # conflate a layout knob with the wire format (wire_* rows
           # override this deliberately).
           "transfer_dtype": "float32"}


def _v(**overrides):
    return {**_PINNED, **overrides}


VARIANTS = [
    ("baseline", _v()),
    ("s2d_stem", _v(stem_space_to_depth=True)),
    ("merge_1x1", _v(merge_inception_branches="1x1")),
    ("merge_full", _v(merge_inception_branches="full")),
    ("s2d+merge_1x1", _v(stem_space_to_depth=True,
                         merge_inception_branches="1x1")),
    ("s2d+merge_full", _v(stem_space_to_depth=True,
                          merge_inception_branches="full")),
    ("remat", _v(remat_backbone=True)),
    ("pallas_grouping", _v(use_pallas_grouping=True)),
    # Round-4 levers (VERDICT r3 Next #1/#4) — measured ON TOP of the
    # production merge_1x1 so deltas read against the shipping step:
    # selective remat of only the large-spatial prefix (stem/2c saved
    # activations are the biggest backward-pass HBM tenants)...
    ("remat_until_2a", _v(merge_inception_branches="1x1",
                          remat_until="MaxPool_2a_3x3")),
    ("remat_until_2c", _v(merge_inception_branches="1x1",
                          remat_until="Conv2d_2c_3x3")),
    ("remat_until_3a", _v(merge_inception_branches="1x1",
                          remat_until="MaxPool_3a_3x3")),
    ("remat_until_3c", _v(merge_inception_branches="1x1",
                          remat_until="Mixed_3c")),
    # ...and the block-diagonal 3x3 merge at ONLY the 28x28 blocks, whose
    # 16/32-channel Branch_2 reduces tile the MXU contracting axis worst.
    ("merge_28x28_full", _v(
        merge_inception_branches="1x1,Mixed_3b=full,Mixed_3c=full")),
    ("merge_3c_full", _v(merge_inception_branches="1x1,Mixed_3c=full")),
    # Round-5: wire-format A/B (VERDICT r4 Next #4) on the PRODUCTION
    # layout (merge_1x1) — same device math, only the host->device bytes
    # and the in-step input conversion differ.  uint8 ships 1/4 of
    # float32's bytes and runs utils.normalize_views inside the step;
    # the question this answers is whether that normalize fuses into the
    # stem (uint8 step time == bf16 step time) or materializes a float
    # copy (uint8 slower by a ~58 MB HBM round trip, ~0.07 ms at 819 GB/s).
    ("wire_f32", _v(merge_inception_branches="1x1",
                    transfer_dtype="float32")),
    ("wire_bf16", _v(merge_inception_branches="1x1",
                     transfer_dtype="bfloat16")),
    ("wire_uint8", _v(merge_inception_branches="1x1",
                      transfer_dtype="uint8")),
    # uint8 wire + the decoded loader's DEVICE-SIDE random flip (configs
    # device_flip): same bytes as wire_uint8 plus a lax reverse + select
    # in the step.  Expected fused (step time == wire_uint8); a gap is
    # the flip materializing a views-sized copy.
    ("wire_uint8_flip", _v(merge_inception_branches="1x1",
                           transfer_dtype="uint8", loader="decoded")),
]


def variant_config(base, overrides):
    """Apply a VARIANTS override dict: top-level model knobs go through
    config.replace; `transfer_dtype`/`loader` route to the DataConfig."""
    overrides = dict(overrides)
    data_kw = {k: overrides.pop(k) for k in ("transfer_dtype", "loader")
               if overrides.get(k) is not None}
    cfg = base.replace(**overrides)
    if data_kw:
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, **data_kw)
        )
    return cfg


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mn40_12view")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--variants", default=None,
                   help="comma-separated subset of variant names")
    p.add_argument("--out", default=None, help="append markdown table here")
    args = p.parse_args(argv)

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    base = get_config(args.config)
    want = set(args.variants.split(",")) if args.variants else None

    rows = []
    base_dt = None
    for name, overrides in VARIANTS:
        if want and name not in want:
            continue
        cfg = variant_config(base, overrides)
        dt, flops = time_variant(cfg, args.batch, iters=args.iters)
        if base_dt is None and name == "baseline":
            base_dt = dt
        row = {
            "variant": name,
            "step_ms": round(dt * 1e3, 2),
            "views_per_sec": round(
                args.batch * base.data.num_views / dt, 1
            ),
            "step_gflops": round(flops / 1e9, 1),
            "speedup_vs_baseline": (
                round(base_dt / dt, 4) if base_dt else None
            ),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out and rows:
        lines = [
            f"# Train-step variants: {args.config} "
            f"(batch {args.batch}, {jax.devices()[0].device_kind})",
            "",
            "| variant | step ms | views/s | step GFLOP | speedup |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['variant']} | {r['step_ms']} | "
                f"{r['views_per_sec']} | {r['step_gflops']} | "
                f"{r['speedup_vs_baseline']} |"
            )
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n\n")


if __name__ == "__main__":
    main()
