"""Chaos tests for the bench supervisor (VERDICT r2 #1).

Two of the first four driver artifacts were lost to transient TPU backend
failures (libtpu client/runtime skew -> FAILED_PRECONDITION) even though
the workload itself was healthy.  bench.py now supervises the workload in
fresh subprocesses with bounded retries and cache bypass; these tests
inject failures and assert (a) the retry path recovers and (b) the final-
failure artifact still parses.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _run(env_extra, timeout=600):
    env = os.environ.copy()
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env)


def _json_lines(stdout):
    return [json.loads(l) for l in stdout.splitlines()
            if l.strip().startswith("{")]


def test_bench_retries_past_injected_failures():
    """Two injected failures, third attempt runs the tiny CPU workload:
    the supervisor must recover and report attempts=3."""
    proc = _run({"HETMOGP_BENCH_TINY": "1",
                 "HETMOGP_BENCH_INJECT_FAIL": "2",
                 "HETMOGP_BENCH_ATTEMPTS": "3"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    (rec,) = _json_lines(proc.stdout)
    assert rec["metric"] == "svi_steps_per_sec_tiny"
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["attempts"] == 3
    # the retries announced the fresh-cache path
    assert "fresh compile cache" in proc.stderr


def test_bench_final_failure_still_emits_parseable_json():
    """All attempts fail: rc=1 but stdout carries one valid JSON line with
    value null and a populated error field (the round-2 artifact was a bare
    crash traceback)."""
    proc = _run({"HETMOGP_BENCH_TINY": "1",
                 "HETMOGP_BENCH_INJECT_FAIL": "3",
                 "HETMOGP_BENCH_ATTEMPTS": "3"}, timeout=300)
    assert proc.returncode == 1
    (rec,) = _json_lines(proc.stdout)
    assert rec["value"] is None
    assert rec["attempts"] == 3
    assert "injected failure" in rec["error"]


def test_quick_mode_has_its_own_metric_name():
    """Quick mode must never masquerade as the flagship metric (round-2
    weak #6) — checked without running the workload."""
    sys.path.insert(0, str(Path(BENCH).parent))
    try:
        import importlib

        bench = importlib.import_module("bench")
        env0 = {k: os.environ.pop(k, None)
                for k in ("HETMOGP_BENCH_QUICK", "HETMOGP_BENCH_TINY")}
        try:
            full_name = bench._workload_params()[0]
            os.environ["HETMOGP_BENCH_QUICK"] = "1"
            quick_name = bench._workload_params()[0]
        finally:
            for k, v in env0.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        assert quick_name != full_name
        assert "quick" in quick_name
    finally:
        sys.path.pop(0)


def test_workload_auto_shards_on_multidevice_host():
    """With >1 visible device, run_workload runs the sharded scan-trainer
    path over a ('data',) mesh (the v5e-8 target) and records the device
    count; the conftest's 8 virtual CPU devices stand in for real chips."""
    import jax

    import bench

    assert jax.device_count() == 8
    r = bench.run_workload("tiny_mesh_check", N_per=1000, M=32, Q=2, B=64,
                           steps_per_call=4, calls=2)
    assert r["devices"] == 8
    assert r["value"] is not None and r["value"] > 0


def test_serve_mode_runs_and_reports_rows_per_sec():
    """--serve workload (observation-space predictive throughput) executes
    on the test host's virtual devices and reports a positive rate."""
    import bench

    r = bench.run_serve("serve_tiny", N_total=2048, M=32, Q=2, chunk=256)
    assert r["unit"] == "rows/sec"
    assert r["value"] > 0
    assert r["devices"] == 8  # sharded path on the virtual mesh
