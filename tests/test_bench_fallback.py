"""bench.py scoreboard guard: a failure must still emit ONE metric line.

Round-3 post-mortem: a Pallas kernel that failed Mosaic lowering crashed
bench.py with rc=1 and `parsed: null`, zeroing the round's driver-recorded
number. The guard retries in safe mode (HFR_FORCE_XLA_OPS=1 — every op
pinned to its XLA twin, ops/dispatch.py) and, if that also fails, emits a
value-0 metric line with the error rather than a bare traceback.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_metric_line_on_total_failure():
    env = dict(os.environ)
    # Injected failure fires in BOTH the default and the safe-mode run, so
    # the test covers the full wrapper (subprocess retry + final emission)
    # in seconds, without running the real model.
    env["HFR_BENCH_FAIL_INJECT"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout  # exactly ONE stdout line
    rec = json.loads(lines[0])
    assert rec["metric"] == "two_stage_e2e_inference_fps"
    assert rec["value"] == 0.0
    assert "injected failure" in rec["error"]
    assert "safe_mode_error" in rec


def test_force_xla_ops_disables_pallas_dispatch(monkeypatch):
    from heterofusionrcnn_tpu.ops.dispatch import pallas_ok

    monkeypatch.setenv("HFR_FORCE_XLA_OPS", "1")
    assert not pallas_ok()
