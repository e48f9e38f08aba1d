"""Closed-loop multi-client load generator (tools/loadgen.py).

Exercises the real InferenceEngine under genuine thread concurrency on a
tiny CPU model: N clients mixing request sizes across the engine's batch
buckets, report must carry aggregate + per-size percentiles and throughput.
"""

import dataclasses

import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.serve import InferenceEngine
from gvcnn_tf_tpu.tools.loadgen import _pct, run_load


@pytest.fixture(scope="module")
def engine():
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    return InferenceEngine(cfg, checkpoint_dir=None, serve_batch_size=2,
                           buckets=(1, 2))


def test_run_load_report_shape(engine):
    rep = run_load(engine, num_clients=3, duration_s=1.0,
                   request_sizes=(1, 2), warmup_s=0.2)
    assert rep["clients"] == 3
    assert rep["request_sizes"] == [1, 2]
    assert rep["requests"] > 0
    assert rep["shapes_per_sec"] > 0
    assert rep["views_per_sec"] == pytest.approx(
        rep["shapes_per_sec"] * 2, rel=1e-6)
    # closed-loop latencies are ordered sanely
    assert 0 < rep["p50_ms"] <= rep["p99_ms"]
    # both sizes were actually exercised (phase offsets mix them)
    assert rep["b1_requests"] > 0 and rep["b2_requests"] > 0
    assert rep["b1_requests"] + rep["b2_requests"] == rep["requests"]
    # engine's own rolling stats saw the same traffic
    assert engine.latency_stats()["count"] >= rep["requests"]


def test_run_load_single_client_matches_engine_contract(engine):
    rep = run_load(engine, num_clients=1, duration_s=0.5,
                   request_sizes=(1,), warmup_s=0.0)
    assert rep["requests"] == rep["b1_requests"]
    assert "b2_p50_ms" not in rep


def test_open_loop_mode(engine):
    """rate_rps > 0: Poisson arrivals at a low offered load — achieved rate
    tracks offered (engine is far from saturation on B=1/B=2 at 32x32),
    and the report carries both."""
    rep = run_load(engine, num_clients=2, duration_s=1.5,
                   request_sizes=(1,), warmup_s=0.2, rate_rps=6.0)
    assert rep["offered_rps"] == 6.0
    assert rep["requests"] > 0
    assert 0 < rep["achieved_rps"] <= 4 * rep["offered_rps"]
    assert rep["p50_ms"] <= rep["p99_ms"]


def test_pct_nearest_rank():
    # p50 of two samples is the LOWER one (nearest-rank), p99 the max.
    assert _pct([1.0, 9.0], 50) == 1.0
    assert _pct([1.0, 9.0], 99) == 9.0
    vals = sorted(np.arange(1, 101).astype(float))
    assert _pct(vals, 50) == 50.0
    assert _pct(vals, 99) == 99.0
