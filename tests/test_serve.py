"""Inference-server tests: real HTTP round-trip against a live server."""

import dataclasses
import io
import json
import urllib.request

import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.serve import serve


@pytest.fixture(scope="module")
def server():
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    httpd, thread = serve(cfg, checkpoint_dir=None, port=0,
                          serve_batch_size=2, block=False)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", cfg
    httpd.shutdown()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_info(server):
    base, cfg = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.read() == b"ok"
    with urllib.request.urlopen(base + "/info", timeout=30) as r:
        info = json.loads(r.read())
    assert info["num_views"] == 2 and info["num_classes"] == 10


def test_predict_roundtrip(server):
    base, cfg = server
    rng = np.random.RandomState(0)
    views = rng.rand(3, 2, 32, 32, 3).astype(np.float32) * 2 - 1
    buf = io.BytesIO()
    np.savez(buf, views=views)
    status, results = _post(base + "/predict", buf.getvalue())
    assert status == 200
    assert len(results) == 3            # chunked: 2 + padded 1
    for r in results:
        assert 0 <= r["class_index"] < 10
        assert 0 < r["probability"] <= 1
        assert len(r["view_scores"]) == 2


def test_predict_single_shape_4d(server):
    base, cfg = server
    views = np.zeros((2, 32, 32, 3), np.float32)
    buf = io.BytesIO()
    np.savez(buf, views=views)
    status, results = _post(base + "/predict", buf.getvalue())
    assert status == 200 and len(results) == 1


def test_predict_bad_payloads(server):
    base, _ = server
    status, err = _post(base + "/predict", b"not an npz")
    assert status == 400 and "error" in err

    buf = io.BytesIO()
    np.savez(buf, wrong_key=np.zeros((1, 2, 32, 32, 3), np.float32))
    status, err = _post(base + "/predict", buf.getvalue())
    assert status == 400 and "views" in err["error"]

    buf = io.BytesIO()
    np.savez(buf, views=np.zeros((1, 2, 16, 16, 3), np.float32))  # wrong HW
    status, err = _post(base + "/predict", buf.getvalue())
    assert status == 400 and "expected" in err["error"]


def test_engine_shards_batch_over_devices():
    """With 8 visible devices and serve_batch_size divisible by them, the
    engine shards the batch over the data mesh (weights replicated)."""
    import jax

    from gvcnn_tf_tpu.serve import InferenceEngine

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, height=32, width=32, num_views=2, batch_size=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    eng = InferenceEngine(cfg, checkpoint_dir=None, serve_batch_size=8)
    assert eng.sharded
    views = np.random.RandomState(0).rand(3, 2, 32, 32, 3).astype(
        np.float32
    )
    out = eng.predict(views)
    assert len(out) == 3
    assert all(0 <= r["class_index"] < 10 for r in out)


def test_stats_latency_endpoint(server):
    """/stats reports rolling p50/p99 request latency after /predict calls
    (VERDICT r2 Next #6)."""
    base, cfg = server
    d = cfg.data
    views = np.zeros((1, d.num_views, d.height, d.width, 3), np.float32)
    buf = io.BytesIO()
    np.savez(buf, views=views)
    for _ in range(3):
        status, _ = _post(base + "/predict", buf.getvalue())
        assert status == 200
    with urllib.request.urlopen(base + "/stats", timeout=60) as r:
        stats = json.loads(r.read())
    assert stats["count"] >= 3
    assert stats["shapes"] >= 3
    assert stats["p50_ms"] > 0
    assert stats["p99_ms"] >= stats["p50_ms"]
    assert stats["serve_batch_size"] == 2


def test_single_shape_uses_b1_bucket():
    """Single-device engines compile a dedicated B=1 executable so one-shape
    requests (the reference predict.py usage shape) skip batch padding."""
    import dataclasses as dc

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.serve import InferenceEngine

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dc.replace(cfg.data, height=32, width=32, num_views=2,
                        batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    eng = InferenceEngine(cfg, None, serve_batch_size=4)
    if eng.sharded:
        assert eng.buckets == [4]
        return
    assert eng.buckets == [1, 4]
    one = eng.predict(np.zeros((1, 2, 32, 32, 3), np.float32))
    assert len(one) == 1
    three = eng.predict(np.zeros((3, 2, 32, 32, 3), np.float32))
    assert len(three) == 3
    five = eng.predict(np.zeros((5, 2, 32, 32, 3), np.float32))
    assert len(five) == 5


def test_engine_bf16_transfer_path():
    """bf16-compute config -> engine ships requests as bf16 (transfer_dtype
    auto); predictions still come back well-formed."""
    import jax.numpy as jnp

    from gvcnn_tf_tpu.serve import InferenceEngine

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="bfloat16",
        use_pallas_grouping=False,
    )
    eng = InferenceEngine(cfg, checkpoint_dir=None, serve_batch_size=2)
    assert eng._in_dtype == jnp.bfloat16
    views = np.random.RandomState(0).rand(3, 2, 32, 32, 3).astype(np.float32)
    out = eng.predict(views * 2 - 1)
    assert len(out) == 3
    assert all(0 <= r["class_index"] < cfg.data.num_classes for r in out)
    assert all(0.0 <= r["probability"] <= 1.0 for r in out)


def test_engine_uint8_wire_path():
    """transfer_dtype='uint8' engine: raw uint8 requests ship as-is (4x
    smaller H2D), float requests are re-quantized, and both agree with a
    float-wire engine on the same underlying 8-bit data."""
    import jax.numpy as jnp

    from gvcnn_tf_tpu.serve import InferenceEngine

    def _cfg(td):
        cfg = get_config("mn10_8view")
        return cfg.replace(
            data=dataclasses.replace(cfg.data, height=32, width=32,
                                     num_views=2, batch_size=2,
                                     transfer_dtype=td),
            compute_dtype="float32",
            use_pallas_grouping=False,
        )

    eng8 = InferenceEngine(_cfg("uint8"), checkpoint_dir=None,
                           serve_batch_size=2)
    engf = InferenceEngine(_cfg("auto"), checkpoint_dir=None,
                           serve_batch_size=2)
    assert eng8._in_dtype == jnp.uint8
    raw = np.random.RandomState(0).randint(
        0, 256, size=(3, 2, 32, 32, 3)).astype(np.uint8)
    normed = raw.astype(np.float32) / 255.0 * 2.0 - 1.0
    out_raw = eng8.predict(raw)                 # uint8 -> uint8 wire
    out_quant = eng8.predict(normed)            # float -> re-quantized
    out_float = engf.predict(raw)               # uint8 -> float wire
    ref = engf.predict(normed)                  # the established path
    for out in (out_raw, out_quant, out_float):
        assert [r["class_index"] for r in out] == \
            [r["class_index"] for r in ref]
    for a, b in zip(out_raw, ref):
        assert abs(a["probability"] - b["probability"]) < 1e-4


def test_uint8_http_payload(server):
    """The HTTP layer preserves uint8 npz payloads end-to-end (server is
    a float-wire engine: the engine normalizes host-side)."""
    base, cfg = server
    raw = np.random.RandomState(1).randint(
        0, 256, size=(2, 2, 32, 32, 3)).astype(np.uint8)
    buf = io.BytesIO()
    np.savez(buf, views=raw)
    status, results = _post(base + "/predict", buf.getvalue())
    assert status == 200 and len(results) == 2
    normed = raw.astype(np.float32) / 255.0 * 2.0 - 1.0
    buf2 = io.BytesIO()
    np.savez(buf2, views=normed)
    _, ref = _post(base + "/predict", buf2.getvalue())
    assert [r["class_index"] for r in results] == \
        [r["class_index"] for r in ref]


def test_engine_custom_buckets():
    """--serve_buckets: each request chunk runs at the smallest compiled
    bucket that fits; the largest bucket sets the chunk stride."""
    from gvcnn_tf_tpu.serve import InferenceEngine

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32, num_views=2,
                                 batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    eng = InferenceEngine(cfg, checkpoint_dir=None, serve_batch_size=4,
                          buckets=[1, 2, 8])
    assert eng.buckets == [1, 2, 4, 8]
    assert eng.batch == 8
    views = np.random.RandomState(0).rand(9, 2, 32, 32, 3).astype(np.float32)
    out = eng.predict(views * 2 - 1)   # chunks: 8 (bucket 8) + 1 (bucket 1)
    assert len(out) == 9
    out3 = eng.predict(views[:3] * 2 - 1)  # bucket 4 with 1 pad row
    assert len(out3) == 3
