"""profile_step parsing/aggregation/trace on a canned scheduled-HLO text.

The fixture mimics the TPU scheduled-HLO shape: entry computation with
per-instruction backend_config estimated_cycles and op_name metadata,
plus a fused subcomputation BEFORE the entry that must be ignored.
"""

import json

from gvcnn_tf_tpu.tools.profile_step import (CLOCK_HZ, aggregate,
                                             chrome_trace, parse_entry)

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
