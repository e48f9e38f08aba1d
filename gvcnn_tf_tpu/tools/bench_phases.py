"""Measured phase decomposition of the flagship train step (VERDICT r3 #1).

The schedule profiler (`profile_step --residual`) decomposes the step from
the compiler's cost model; this tool produces the MEASURED counterpart by
timing three real executables at the production shapes/options:

  fwd      — forward + loss only (no gradients)
  grad     — jax.value_and_grad, gradients computed but no optimizer
  full     — the shipping train step (grads + optimizer + BN stats)

so that  bwd ≈ grad − fwd  and  optimizer+state ≈ full − grad  are measured
wall-clock numbers that the schedule-bucket table must be consistent with.
Caveat: each variant is its own XLA schedule, so the subtraction carries
schedule noise (the fwd inside `grad` also saves activations the pure fwd
does not); report all three absolutes alongside the deltas.

    python -m gvcnn_tf_tpu.tools.bench_phases --batch 32 --iters 30
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters: int, chunk: int = 10, sync=None):
    out = fn(*args)
    (sync or (lambda o: jax.block_until_ready(o)))(out)
    samples = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = fn(*args)
        (sync or (lambda o: jax.block_until_ready(o)))(out)
        samples.append((time.perf_counter() - t0) / chunk)
    samples.sort()
    return samples[len(samples) // 2]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mn40_12view")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    from gvcnn_tf_tpu.configs import get_config, resolve_transfer_dtype
    from gvcnn_tf_tpu.train import create_train_state, make_train_step
    from gvcnn_tf_tpu.utils import (normalize_views, setup_compilation_cache,
                                    tpu_compiler_options)

    setup_compilation_cache()
    cfg = get_config(args.config)
    if jax.default_backend() != "tpu":
        cfg = cfg.replace(compute_dtype="float32", use_pallas_grouping=False)
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, height=64, width=64, batch_size=2))
    else:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, batch_size=args.batch))
    d = cfg.data
    copts = tpu_compiler_options()
    model, tx, state = create_train_state(cfg, jax.random.key(0))

    rng = np.random.RandomState(0)
    vdt = resolve_transfer_dtype(cfg) or jnp.float32
    views = jnp.asarray(
        rng.rand(d.batch_size, d.num_views, d.height, d.width, 3),
        jnp.float32).astype(vdt)
    labels = jnp.asarray(
        rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32)
    batch = {"views": views, "label": labels}
    key = jax.random.key(1)

    import optax

    tc = cfg.train

    def loss_only(params, batch_stats, views, labels):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize_views(views), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels).mean()

    def sync_scalar(out):
        leaf = jax.tree.leaves(out)[0]
        float(jax.device_get(jnp.ravel(leaf)[0]))

    fwd = jax.jit(loss_only, compiler_options=copts)
    grad = jax.jit(jax.value_and_grad(loss_only), compiler_options=copts)
    full = jax.jit(make_train_step(model, tx, cfg), compiler_options=copts)

    t_fwd = _time(fwd, (state.params, state.batch_stats, views, labels),
                  args.iters, sync=sync_scalar)
    t_grad = _time(grad, (state.params, state.batch_stats, views, labels),
                   args.iters, sync=sync_scalar)
    # full is timed WITHOUT donation so state can be reused across calls
    # (donation saves an alias copy; measured effect is small and it keeps
    # the three variants' calling convention identical).
    t_full = _time(lambda s, b, k: full(s, b, k)[1], (state, batch, key),
                   args.iters, sync=sync_scalar)

    out = {
        "config": cfg.name,
        "batch_shapes": d.batch_size,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "grad_ms": round(t_grad * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "bwd_minus_fwd_ms": round((t_grad - t_fwd) * 1e3, 2),
        "optimizer_state_ms": round((t_full - t_grad) * 1e3, 2),
        "device": jax.devices()[0].device_kind,
        "weight_decay_in_full_only": tc.weight_decay > 0,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
