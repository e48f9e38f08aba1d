"""Benchmark harness — prints ONE JSON line for the driver.

Metric: views/sec/chip on the flagship training step (GVCNN 12-view
ModelNet40, Inception-v1, bf16 — BASELINE config 3).  `vs_baseline` is the
fraction of the chip's bf16 roofline achieved, computed from XLA's own cost
analysis of the compiled step (north-star target: >= 0.95 of roofline conv
throughput, BASELINE.json:5).  The reference publishes no throughput
numbers (BASELINE.md), so roofline fraction is the honest denominator.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak FLOP/s per chip by device kind (dense).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12 if jax.default_backend() == "tpu" else 1e12  # cpu: nominal


def _discover_backend(timeout_s: float = 150.0):
    """-> (backend_name or None, failure_reason or None).

    Backend discovery runs in a SUBPROCESS: the remote TPU plugin either
    fails fast (`RuntimeError: Unable to initialize backend 'axon'`) or —
    when the device tunnel is half-open — HANGS indefinitely inside
    plugin init, and only a process boundary can bound the hang.  The
    parent never touches jax.devices() until this verdict is in, so an
    outage yields a structured JSON record instead of rc=1
    (VERDICT r4: BENCH_r04.json was `parsed: null` for exactly this).
    """
    import os
    import subprocess

    forced = os.environ.get("GVCNN_BENCH_FORCE_BACKEND_FAIL")
    if forced:  # test hook: simulate a dead tunnel without one
        return None, f"simulated backend failure ({forced})"
    if "cpu" in (os.environ.get("JAX_PLATFORMS", "")
                 + os.environ.get("JAX_PLATFORM_NAME", "")).lower():
        return "cpu", None
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND=' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None, (f"backend discovery hung >{timeout_s:.0f}s "
                      "(half-open device tunnel)")
    for line in r.stdout.splitlines():
        if line.startswith("BACKEND="):
            return line[len("BACKEND="):].strip(), None
    tail = (r.stderr.strip().splitlines() or ["backend init failed"])[-1]
    return None, tail[:200]


def main():
    backend, fail_reason = _discover_backend()
    tpu_unavailable = backend is None
    if backend != "tpu":
        # Force CPU through jax.config BEFORE any device discovery in THIS
        # process — with only the env var set, the container's
        # force-registered remote TPU plugin still initializes inside
        # default_backend(), and that blocks indefinitely when the tunnel
        # is half-open (same guard as __graft_entry__._ensure_devices).
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    on_tpu = jax.default_backend() == "tpu"
    import os
    # Quick mode (tests / outage smoke): train-step timing only — skip the
    # serving-latency, load-generator and backbone-FLOPs sections, each of
    # which costs extra XLA CPU compiles (minutes on the 1-core host).
    quick = bool(os.environ.get("GVCNN_BENCH_QUICK"))

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.train import create_train_state, make_train_step
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    cfg = get_config("mn40_12view")
    if on_tpu:
        batch = 32
    else:  # keep the CPU fallback quick
        batch = 2
        cfg = cfg.replace(
            compute_dtype="float32",
            use_pallas_grouping=False,
            data=dataclasses.replace(cfg.data, height=64, width=64),
        )
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=batch))
    d = cfg.data

    from gvcnn_tf_tpu.utils import tpu_compiler_options

    copts = tpu_compiler_options()
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0,
                   compiler_options=copts)

    rng = np.random.RandomState(0)
    # Feed at the production transfer dtype (DataConfig.transfer_dtype
    # "auto" -> bfloat16 for this bf16 config): same values the prefetch
    # layer ships, and it keeps the in-step input convert off the clock.
    from gvcnn_tf_tpu.configs import resolve_transfer_dtype

    views_dtype = resolve_transfer_dtype(cfg) or jnp.float32
    views = jnp.asarray(
        rng.rand(d.batch_size, d.num_views, d.height, d.width, 3),
        jnp.float32,
    ).astype(views_dtype)
    labels = jnp.asarray(
        rng.randint(0, d.num_classes, size=d.batch_size), jnp.int32
    )
    batch_data = {"views": views, "label": labels}
    key = jax.random.key(1)

    # FLOPs of one step from XLA's cost model (for the roofline fraction).
    try:
        if quick:  # second compile of the step; minutes on 1-core CPU
            raise RuntimeError("skipped: GVCNN_BENCH_QUICK")
        lowered = jax.jit(
            make_train_step(model, tx, cfg)
        ).lower(state, batch_data, key)
        cost = lowered.compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        step_flops = 0.0

    # Timing note: on the tunneled axon platform block_until_ready returns
    # early, so we sync by fetching a scalar to host — the device_get can
    # only complete after every chained step has executed.
    warmup, iters = (3, 30) if on_tpu else (1, 2)
    for _ in range(warmup):
        state, mets = step(state, batch_data, key)
    float(jax.device_get(mets["loss"]))
    # Chunked timing (chains of 10 steps per sync) -> median is robust to
    # tunnel/dispatch jitter while amortizing the host-sync round trip.
    chunk = 10 if on_tpu else 1
    samples = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, mets = step(state, batch_data, key)
        float(jax.device_get(mets["loss"]))
        samples.append((time.perf_counter() - t0) / chunk)
    samples.sort()
    dt = samples[len(samples) // 2]

    n_chips = 1  # single-chip bench (driver runs on one real chip)
    views_per_sec = d.batch_size * d.num_views / dt / n_chips
    shapes_per_sec = d.batch_size / dt / n_chips

    # Inference path (serving): forward-only views/sec at the same batch,
    # with BN folded into the conv kernels (exact; serve.py's default).
    eval_views_per_sec = 0.0
    if not quick:
        from gvcnn_tf_tpu.utils import fold_batch_norm

        variables = fold_batch_norm(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0],
                      compiler_options=copts)
        out = fwd(variables, views)
        float(jax.device_get(out[0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, views)
        float(jax.device_get(out[0, 0]))
        dt_fwd = (time.perf_counter() - t0) / iters
        eval_views_per_sec = d.batch_size * d.num_views / dt_fwd

    # Peak serving throughput: B=64 is the measured sweet spot on v5e
    # (docs/PERF_VARIANTS.md r3b, +8% over B=32; --serve_batch_size 64).
    serving_peak = 0.0
    if on_tpu:
        try:
            views64 = jnp.concatenate([views, views], axis=0)
            out = fwd(variables, views64)
            float(jax.device_get(out[0, 0]))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, views64)
            float(jax.device_get(out[0, 0]))
            dt64 = (time.perf_counter() - t0) / iters
            serving_peak = views64.shape[0] * d.num_views / dt64
        except Exception:
            pass

    # Serving latency (VERDICT r2 Next #6): per-request p50/p99 at B=1 (the
    # reference predict.py's actual usage shape) and at the serve.py padded
    # batch (8), BN-folded (serving default) vs unfolded.  Each call is
    # synced individually — that IS the serving latency through this stack.
    def _latency(fn, v, x, iters, warmup=5):
        # Warm past compile AND the first executions (r3's folded-path p99
        # was 2.4x p50 with a single warmup call — tail diagnosis needs the
        # warmup excluded and the tail shape visible, VERDICT r3 Next #3).
        for _ in range(max(warmup, 1)):
            out = fn(v, x)
            float(jax.device_get(out[0, 0]))
        raw = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(v, x)
            float(jax.device_get(out[0, 0]))
            raw.append(time.perf_counter() - t0)
        ts = sorted(raw)

        def pct(p):
            # Nearest-rank, same convention as serve.latency_stats and
            # tools/loadgen (the naive int(p/100*n) is one rank high: p99
            # of 50 samples would literally be the max).
            import math
            i = min(max(math.ceil(p / 100 * len(ts)) - 1, 0), len(ts) - 1)
            return ts[i] * 1e3

        return (pct(50), pct(99),
                {"p90_ms": round(pct(90), 2),
                 "max_ms": round(ts[-1] * 1e3, 2),
                 # where in the window the max landed (0 = right after
                 # warmup => leakage; elsewhere => sporadic stall)
                 "max_idx": int(np.argmax(raw))})

    serving_latency = {}
    try:
        if quick:
            raise RuntimeError("skipped: GVCNN_BENCH_QUICK")
        unfolded = {"params": state.params, "batch_stats": state.batch_stats}
        lat_iters = 50 if on_tpu else 3
        lat_warm = 5 if on_tpu else 1   # CPU fwd is seconds per call
        # Null-dispatch floor: on the tunneled axon platform each synced
        # call pays a host<->device round trip (~1.5-35 ms depending on
        # path) that a local TPU VM would not; report it so per-shape
        # device latency can be read as p50 - floor.
        null = jax.jit(lambda v, x: x * 1.0)
        xs1 = jnp.zeros((1, 1), jnp.float32)
        p50f, p99f, tailf = _latency(null, xs1, xs1, lat_iters,
                                     warmup=lat_warm)
        serving_latency["dispatch_floor_p50_ms"] = round(p50f, 2)
        # The floor's own tail is the attribution control for the model
        # rows' p99 (VERDICT r3 weak #1 / r4 Next #5): a null dispatch has
        # no executable to blame, so floor p99 >> floor p50 pins sporadic
        # request-latency spikes on the tunnel/host, not on the folded
        # executable.
        serving_latency["dispatch_floor_p99_ms"] = round(p99f, 2)
        serving_latency["dispatch_floor_tail"] = tailf
        for nb in (1, 8):
            xs = views[:1].repeat(nb, axis=0) if nb > 1 else views[:1]
            for tag, v in (("folded", variables), ("unfolded", unfolded)):
                p50, p99, tail = _latency(fwd, v, xs, lat_iters, warmup=lat_warm)
                serving_latency[f"b{nb}_{tag}_p50_ms"] = round(p50, 2)
                serving_latency[f"b{nb}_{tag}_p99_ms"] = round(p99, 2)
                serving_latency[f"b{nb}_{tag}_tail"] = tail
    except Exception as e:  # keep the headline metric; don't hide the loss
        serving_latency["error"] = f"{type(e).__name__}: {e}"[:200]

    # Serving under concurrency (VERDICT r3 Next #8): 4 closed-loop clients
    # mixing B=1 and B=8 requests against the real bucketed engine — the
    # device lock means request latency now includes queueing behind other
    # clients, which the single-client rows above cannot see.
    if on_tpu:
        try:
            from gvcnn_tf_tpu.serve import InferenceEngine
            from gvcnn_tf_tpu.tools.loadgen import run_load

            eng = InferenceEngine(cfg, state=state, serve_batch_size=8)
            load_s = 8.0
            rep = run_load(eng, num_clients=4, duration_s=load_s,
                           request_sizes=(1, 8), warmup_s=1.0)
            for k in ("p50_ms", "p99_ms", "b1_p50_ms", "b1_p99_ms",
                      "b8_p50_ms", "b8_p99_ms", "requests",
                      "shapes_per_sec", "views_per_sec"):
                if k in rep:
                    serving_latency[f"concurrent4_{k}"] = rep[k]
            # Open-loop tail at 70% of the closed-loop capacity just
            # measured: fixed offered rate, coordinated-omission-free —
            # the latency a client actually sees at realistic load, which
            # closed-loop's self-throttling understates.
            cap_rps = rep["requests"] / load_s
            if cap_rps > 0:  # zero would silently rerun CLOSED loop
                rep_o = run_load(eng, num_clients=4, duration_s=load_s,
                                 request_sizes=(1, 8), warmup_s=1.0,
                                 rate_rps=0.7 * cap_rps)
                for k in ("p50_ms", "p99_ms", "offered_rps",
                          "achieved_rps"):
                    if k in rep_o:
                        serving_latency[f"openloop70_{k}"] = rep_o[k]
        except Exception as e:
            serving_latency["concurrent4_error"] = (
                f"{type(e).__name__}: {e}"[:200])

    # Backbone-only train FLOPs (the conv tower is ~95% of model FLOPs,
    # SURVEY.md section 3.4): attainment computed against these is the
    # "conv-only roofline" view the north star asks for — whole-step MFU
    # also counts optimizer/BN/grouping FLOPs and hides where loss is.
    try:
        if quick:
            raise RuntimeError("skipped: GVCNN_BENCH_QUICK")
        from gvcnn_tf_tpu.models.backbones import get_backbone
        import functools as _ft

        bb_cls = get_backbone(cfg.backbone)
        bb = bb_cls(dtype=jnp.dtype(cfg.compute_dtype))
        xb = jnp.zeros(
            (d.batch_size * d.num_views, d.height, d.width, 3), jnp.float32
        )
        bb_vars = jax.eval_shape(
            _ft.partial(bb.init, train=False), {"params": jax.random.key(0)},
            xb,
        )
        bb_vars = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), bb_vars
        )

        def bb_loss(p, x):
            (f, _), _ = bb.apply(
                {"params": p, "batch_stats": bb_vars["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
            )
            return jnp.sum(f.astype(jnp.float32))

        bb_cost = (
            jax.jit(jax.value_and_grad(bb_loss))
            .lower(bb_vars["params"], xb).compile().cost_analysis()
        ) or {}
        backbone_train_flops = float(bb_cost.get("flops", 0.0))
    except Exception:
        backbone_train_flops = 0.0

    if step_flops > 0:
        roofline_frac = (step_flops / dt) / _peak_flops()
    else:
        roofline_frac = 0.0
    conv_roofline_frac = (
        (backbone_train_flops / dt) / _peak_flops()
        if backbone_train_flops > 0
        else 0.0
    )

    record = {
        "metric": "train_views_per_sec_per_chip_12view",
        "value": round(views_per_sec, 2),
        "unit": "views/s/chip",
        "vs_baseline": round(roofline_frac, 4),
        "extra": {
            "shapes_per_sec": round(shapes_per_sec, 2),
            "eval_views_per_sec": round(eval_views_per_sec, 2),
            "serving_peak_views_per_sec_b64": round(serving_peak, 2),
            "step_time_ms": round(dt * 1e3, 2),
            "step_time_ms_min": round(samples[0] * 1e3, 2),
            "step_time_ms_max": round(samples[-1] * 1e3, 2),
            "step_flops": step_flops,
            "backbone_train_flops": backbone_train_flops,
            "conv_roofline_frac": round(conv_roofline_frac, 4),
            "device": jax.devices()[0].device_kind,
            "batch_shapes": d.batch_size,
            "loss": float(mets["loss"]),
            "serving_latency": serving_latency,
        },
    }
    if tpu_unavailable:
        # TPU was expected but backend init failed/hung: the numbers above
        # are the CPU-fallback sanity run (tiny shapes), NOT chip numbers.
        record["tpu_unavailable"] = True
        record["extra"]["tpu_unavailable_reason"] = fail_reason
        record["extra"]["cpu_sanity"] = True
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
