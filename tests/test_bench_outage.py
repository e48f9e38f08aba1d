"""bench.py must survive a dead TPU backend (VERDICT r4 Next #2).

Round 4's driver bench run exited rc=1 with an unparseable traceback
because `jax.default_backend()` raised when the device tunnel failed
fast.  The contract now: a simulated backend-init failure still exits 0
and prints ONE parseable JSON line flagged `tpu_unavailable`, carrying
CPU-fallback sanity numbers.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_outage_emits_structured_json():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # outage path, not the explicit-cpu path
    env["GVCNN_BENCH_FORCE_BACKEND_FAIL"] = "test-simulated-outage"
    env["GVCNN_BENCH_QUICK"] = "1"  # train-step timing only (1-core host)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cpu_test_cache")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["tpu_unavailable"] is True
    assert rec["metric"] == "train_views_per_sec_per_chip_12view"
    assert rec["value"] > 0  # CPU sanity numbers, not a crash
    assert rec["extra"]["cpu_sanity"] is True
    assert "simulated" in rec["extra"]["tpu_unavailable_reason"]


def test_discover_backend_hook_and_cpu_env(monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("GVCNN_BENCH_FORCE_BACKEND_FAIL", "x")
    b, reason = bench._discover_backend()
    assert b is None and "simulated" in reason
    monkeypatch.delenv("GVCNN_BENCH_FORCE_BACKEND_FAIL")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._discover_backend() == ("cpu", None)
