"""profile_step parsing/aggregation/trace on a canned scheduled-HLO text.

The fixture mimics the TPU scheduled-HLO shape: entry computation with
per-instruction backend_config estimated_cycles and op_name metadata,
plus a fused subcomputation BEFORE the entry that must be ignored.
"""

import json

from gvcnn_tf_tpu.tools.profile_step import (CLOCK_HZ, HBM_BPS, aggregate,
                                             chrome_trace, parse_entry,
                                             residual_decomposition,
                                             shape_bytes)

FIXTURE = """\
HloModule jit_train_step, is_scheduled=true

%fused_computation.1 (p0: bf16[384,28,28,96]) -> bf16[384,28,28,96] {
  %p0 = bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  ROOT %t = bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)} tanh(%p0), metadata={op_name="inner/should_not_count"}
}

ENTRY %main.42 (p0: f32[2,2]) -> f32[2,2] {
  %conv.1 = bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)} convolution(%a, %b), metadata={op_name="jit(train_step)/jvp(GVCNN)/GoogLeNet/Mixed_3b/Branch_1/Conv2d_0a_1x1/conv_general" source_file="x.py"}, backend_config={"flag_configs":[],"estimated_cycles":"940000"}
  %fusion.2 = bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)} fusion(%conv.1), kind=kLoop, metadata={op_name="jit(train_step)/transpose(jvp(GVCNN))/GoogLeNet/Mixed_3b/Branch_1/Conv2d_0a_1x1/mul"}, backend_config={"estimated_cycles":"470000"}
  %pool.1 = bf16[384,112,112,64]{3,2,1,0:T(8,128)(2,1)} reduce-window(%c, %d), metadata={op_name="jit(train_step)/jvp(GVCNN)/GoogLeNet/MaxPool_2a_3x3/reduce_window_max"}, backend_config={"estimated_cycles":"94000"}
  ROOT %opt.1 = (f32[64]{0}, f32[64]{0}) fusion(%e), kind=kLoop, metadata={op_name="jit(train_step)/sgd/add"}, backend_config={"estimated_cycles":"9400"}
}
"""


def test_parse_entry_skips_subcomputations():
    rows = parse_entry(FIXTURE)
    assert [r["name"] for r in rows] == ["conv.1", "fusion.2", "pool.1",
                                        "opt.1"]
    assert rows[0]["cycles"] == 940000
    assert rows[0]["op"] == "convolution"
    assert "Mixed_3b" in rows[0]["op_name"]
    # tuple-shaped result parses
    assert rows[3]["shape"].startswith("(")


def test_aggregate_layers_and_phases():
    rows = parse_entry(FIXTURE)
    layers, total = aggregate(rows)
    assert total == 940000 + 470000 + 94000 + 9400
    by_name = {r["layer"]: r for r in layers}
    # leftmost module match -> endpoint/block granularity (Mixed_3b, not
    # the Conv2d inside it) — same granularity as docs/PERF_LAYERS.md.
    conv = by_name["Mixed_3b"]
    # 940000 cycles fwd = 1.0 ms at the v5e clock; 470000 bwd = 0.5 ms.
    assert abs(conv["fwd_ms"] - 1.0) < 1e-6
    assert abs(conv["bwd_ms"] - 0.5) < 1e-6
    assert by_name["MaxPool_2a_3x3"]["fwd_ms"] > 0
    # optimizer ops (no model module in the path) fall into a family bucket
    assert any(r["layer"].startswith("(") for r in layers)
    # sorted by cycles desc
    assert layers[0]["layer"] == "Mixed_3b"


def test_chrome_trace_roundtrip(tmp_path):
    rows = parse_entry(FIXTURE)
    trace = chrome_trace(rows)
    # json-serializable, events in cumulative time order per emission
    s = json.dumps(trace)
    assert "traceEvents" in trace
    evs = [e for e in trace["traceEvents"] if e["ph"] == "X"]
    assert len(evs) == len(rows)
    assert evs[0]["ts"] == 0.0
    assert evs[1]["ts"] > 0.0
    # durations are cycles at the clock, in us
    assert abs(evs[0]["dur"] - 940000 / CLOCK_HZ * 1e6) < 1e-3
    # fwd and bwd land on different tracks
    tids = {e["tid"] for e in evs}
    assert len(tids) >= 2
    (tmp_path / "t.json").write_text(s)


RESIDUAL_FIXTURE = """\
HloModule jit_train_step, is_scheduled=true

ENTRY %main.42 (p0: f32[2,2]) -> f32[2,2] {
  %cvt.0 = bf16[8,4,4,3]{3,2,1,0} convert(%p0), metadata={op_name="jit(train_step)/convert_element_type"}, backend_config={"estimated_cycles":"1000"}
  %conv.1 = bf16[8,4,4,16]{3,2,1,0} convolution(%cvt.0, %w0), metadata={op_name="jit(train_step)/jvp(GVCNN)/GoogLeNet/Mixed_3b/Branch_1/Conv2d_0a_1x1/conv"}, backend_config={"estimated_cycles":"940000"}
  %loss.1 = f32[] fusion(%conv.1), kind=kLoop, metadata={op_name="jit(train_step)/softmax_cross_entropy/mean"}, backend_config={"estimated_cycles":"5000"}
  %gconv.1 = bf16[8,4,4,16]{3,2,1,0} fusion(%conv.1, %loss.1), kind=kOutput, metadata={op_name="jit(train_step)/transpose(jvp(GVCNN))/GoogLeNet/Mixed_3b/Branch_1/Conv2d_0a_1x1/conv_t"}, backend_config={"estimated_cycles":"470000"}
  %cp.1 = bf16[8,4,4,16]{3,2,1,0} copy(%gconv.1), metadata={op_name="jit(train_step)/copy"}, backend_config={"estimated_cycles":"2000"}
  %ar.1 = bf16[8,4,4,16]{3,2,1,0} all-reduce(%cp.1), metadata={op_name="jit(train_step)/psum"}, backend_config={"estimated_cycles":"3000"}
  ROOT %opt.1 = (f32[16]{0}, f32[16]{0}) fusion(%ar.1), kind=kLoop, metadata={op_name="jit(train_step)/add"}, backend_config={"estimated_cycles":"9400"}
}
"""


def test_shape_bytes():
    assert shape_bytes("bf16[384,28,28,96]{3,2,1,0:T(8,128)(2,1)}") == \
        384 * 28 * 28 * 96 * 2
    assert shape_bytes("f32[]") == 0 or shape_bytes("f32[]") == 4
    # tuples sum their leaves
    assert shape_bytes("(f32[64]{0}, bf16[8]{0})") == 64 * 4 + 8 * 2
    assert shape_bytes("f32[2,3]") == 24


def test_residual_decomposition_buckets():
    rows = parse_entry(RESIDUAL_FIXTURE)
    d = residual_decomposition(rows)
    b = d["buckets_ms"]

    def ms(c):
        return round(c / CLOCK_HZ * 1e3, 3)

    assert b["layer_fwd"] == ms(940000)
    assert b["layer_bwd"] == ms(470000)
    # copy + all-reduce + root update are all AFTER the last bwd op ->
    # collectives keep their own bucket, the rest is optimizer tail.
    assert b["collectives"] == ms(3000)
    assert b["optimizer_tail"] == ms(2000 + 9400)
    # input convert is a no-layer data-movement op before the bwd pass
    assert b["data_movement"] == ms(1000)
    # loss glue: no layer, no phase marker -> shared other
    assert b["shared_other_other"] == ms(5000)
    assert d["shared_est_ms"] == ms(1000 + 5000 + 2000 + 3000 + 9400)


def test_residual_activation_saves():
    rows = parse_entry(RESIDUAL_FIXTURE)
    d = residual_decomposition(rows)["activation_save"]
    # conv.1 (fwd) is consumed by gconv.1 (bwd): one saved tensor.
    assert d["tensors"] == 1
    expected = 8 * 4 * 4 * 16 * 2
    assert d["bytes"] == expected
    assert d["top"][0]["layer"] == "Mixed_3b"
    assert abs(d["roundtrip_ms"] - round(2 * expected / HBM_BPS * 1e3, 3)) \
        < 1e-9


def test_operand_parsing():
    rows = parse_entry(RESIDUAL_FIXTURE)
    by = {r["name"]: r for r in rows}
    assert by["gconv.1"]["operands"] == ["conv.1", "loss.1"]
    assert by["cvt.0"]["operands"] == ["p0"]


def test_cli_residual_flag(tmp_path, capsys):
    from gvcnn_tf_tpu.tools.profile_step import main

    src = tmp_path / "step.hlo"
    src.write_text(RESIDUAL_FIXTURE)
    main(["--hlo-in", str(src), "--residual"])
    out = json.loads(capsys.readouterr().out)
    assert "residual" in out
    assert out["residual"]["activation_save"]["tensors"] == 1


def test_train_schedule_trace_fallback(tmp_path, monkeypatch):
    """profile_steps under the axon guard writes the schedule trace."""
    import dataclasses

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.train import train as train_fn

    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # only the guard reads it
    logdir = str(tmp_path / "train")
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32,
            num_views=2, batch_size=2, synthetic_num_shapes=4,
        ),
        train=dataclasses.replace(
            cfg.train, num_steps=2, log_every=2, checkpoint_every=0,
            train_logdir=logdir, optimizer="adam",
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )
    import os
    os.makedirs(logdir, exist_ok=True)
    train_fn(cfg, profile_steps=(1, 2))
    path = os.path.join(logdir, "schedule_trace.json")
    assert os.path.exists(path)
    trace = json.load(open(path))
    evs = [e for e in trace["traceEvents"] if e["ph"] == "X"]
    assert len(evs) > 10  # the full train step schedule


def test_cli_offline_hlo_in(tmp_path, capsys):
    """--hlo-in profiles an existing scheduled-HLO dump (no compile)."""
    from gvcnn_tf_tpu.tools.profile_step import main

    src = tmp_path / "step.hlo"
    src.write_text(FIXTURE)
    trace = tmp_path / "trace.json"
    main(["--hlo-in", str(src), "--trace", str(trace), "--top", "5"])
    out = json.loads(capsys.readouterr().out)
    assert out["scheduled_ops"] == 4
    assert out["layers_top"][0]["layer"] == "Mixed_3b"
    assert trace.exists()
