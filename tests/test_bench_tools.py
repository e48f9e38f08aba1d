"""Smoke tests for the performance-attribution tools so the perf harness
can't bit-rot (tools/bench_layers.py, tools/bench_variants.py,
tools/bench_stem.py). Tiny shapes, CPU; timing values are not asserted."""

import json

import pytest

pytestmark = pytest.mark.slow  # each compiles small models (CPU minutes)


def test_bench_layers_runs_and_attributes(capsys):
    from gvcnn_tf_tpu.tools.bench_layers import run

    rows, summary = run(
        "inception_v1", batch=2, height=32, width=32, dtype="float32",
        mode="fwd", iters=2,
        endpoints=["Conv2d_1a_7x7", "MaxPool_2a_3x3"],
    )
    assert [r["endpoint"] for r in rows] == [
        "Conv2d_1a_7x7", "MaxPool_2a_3x3",
    ]
    assert summary["total_ms"] > 0
    assert rows[0]["gflops"] > 0


def test_bench_layers_merge_and_s2d_variants():
    from gvcnn_tf_tpu.tools.bench_layers import bench_endpoint

    r = bench_endpoint(
        "inception_v1", "Conv2d_1a_7x7", batch=1, height=32, width=32,
        dtype="float32", mode="fwd", iters=2, s2d=True,
    )
    assert r["t"] > 0 and r["flops"] > 0


def test_bench_variants_time_variant():
    import dataclasses

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.tools.bench_variants import time_variant

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        compute_dtype="float32",
        data=dataclasses.replace(
            cfg.data, height=32, width=32, num_views=2,
        ),
    )
    dt, flops = time_variant(cfg, batch=2, iters=2, chunk=1)
    assert dt > 0 and flops > 0


def test_bench_stem_compare(capsys):
    from gvcnn_tf_tpu.tools.bench_stem import main

    main(["--batch", "2", "--height", "32", "--iters", "2"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["op"] == "stem7x7s2"
    assert row["xla_ms"] > 0


def test_bench_phases_decomposition(monkeypatch, capsys):
    """Measured phase decomposition runs end-to-end and reports consistent
    absolutes (fwd <= grad; full > 0); deltas are informational."""
    import gvcnn_tf_tpu.tools.bench_phases as bp

    out = bp.main(["--iters", "2"])
    assert out["fwd_ms"] > 0 and out["grad_ms"] > 0 and out["full_ms"] > 0
    # No fwd-vs-grad ordering assert: each variant is its own XLA schedule
    # and on the 1-core CPU backend the relative times are pure noise (the
    # tool's docstring carries the same caveat).  The delta is computed
    # from UNROUNDED seconds, so comparing against the rounded ms fields
    # carries up to 0.01 ms of double rounding.
    assert abs(out["bwd_minus_fwd_ms"]
               - (out["grad_ms"] - out["fwd_ms"])) <= 0.011
    printed = json.loads(capsys.readouterr().out)
    assert printed["full_ms"] == out["full_ms"]
