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


def test_bench_variants_wire_rows_route_transfer_dtype():
    """Every wire_* row must pin transfer_dtype on the DataConfig and keep
    the production merge_1x1 layout; legacy rows stay on the f32 feed."""
    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.tools.bench_variants import VARIANTS, variant_config

    base = get_config("mn40_12view")
    byname = dict(VARIANTS)
    for name, td in (("wire_f32", "float32"), ("wire_bf16", "bfloat16"),
                     ("wire_uint8", "uint8")):
        cfg = variant_config(base, byname[name])
        assert cfg.data.transfer_dtype == td
        assert cfg.merge_inception_branches == "1x1"
    legacy = variant_config(base, byname["baseline"])
    assert legacy.data.transfer_dtype == "float32"
    flip = variant_config(base, byname["wire_uint8_flip"])
    assert flip.data.transfer_dtype == "uint8"
    assert flip.data.loader == "decoded"       # activates the step flip
    assert flip.data.augment and flip.data.device_flip


def test_bench_variants_uint8_wire():
    """wire_uint8 feeds raw uint8 through the REAL jitted step (the
    on-device normalize_views path) — must run, not just compile."""
    import dataclasses

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.tools.bench_variants import time_variant

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        compute_dtype="float32",
        data=dataclasses.replace(
            cfg.data, height=32, width=32, num_views=2,
            transfer_dtype="uint8",
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


def test_check_wire_fusion_parser_and_tool(capsys):
    """HLO-parsing units + the end-to-end tiny-shape run (compile-only).

    The CPU backend's verdict is not asserted (materialization is
    backend-specific; the campaign runs the tool on the TPU backend) —
    only that both programs compile, parse, and produce a verdict."""
    from gvcnn_tf_tpu.tools.check_wire_fusion import (
        _rhs_shape_and_op, _float_elem_counts, entry_materializations, main)

    assert _rhs_shape_and_op(
        "bf16[2,3]{1,0} fusion(%a), kind=kLoop") == ("bf16[2,3]{1,0}",
                                                     "fusion")
    assert _rhs_shape_and_op(
        "(f32[4]{0}, u32[]) all-reduce-start(%x), to_apply=%s"
    ) == ("(f32[4]{0}, u32[])", "all-reduce-start")
    assert _float_elem_counts("(f32[4]{0}, u32[], bf16[2,2]{1,0})") == [
        ("f32", 4), ("bf16", 4)]

    hlo = """\
ENTRY %main.1 (p0: u8[2,12]) -> f32[2,12] {
  %p0 = u8[2,12]{1,0} parameter(0)
  %big = f32[2,12]{1,0} fusion(%p0), kind=kLoop, calls=%fc
  ROOT %small = f32[2]{0} fusion(%big), kind=kLoop, calls=%fc2
}
"""
    rows = entry_materializations(hlo, 24, 52)
    assert [r["name"] for r in rows] == ["big"]  # param + small excluded

    report = main(["--config", "mn10_8view", "--batch", "2",
                   "--merge", "none", "--height", "32", "--views", "2"])
    out = capsys.readouterr().out
    assert json.loads(out)["verdict"] == report["verdict"]
    assert "uint8_extra_materializations" in report
    assert isinstance(report["wire_uint8"], list)
