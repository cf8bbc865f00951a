"""The driver contract: bench.py prints exactly one JSON line with the
required keys, under its deadline, even when phases are degraded."""

import json
import os
import subprocess
import sys


def _run_bench(extra_env, timeout):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout
    return json.loads(json_lines[0]), proc


def test_bench_survives_first_dispatch_hang():
    """Fault injection for the r4 failure mode: the first measurement
    child wedges before its first backend dispatch (a tunnel death
    window). The orchestrator must kill it, retry, and still print a
    NONZERO measured line within the deadline."""
    rec, proc = _run_bench(
        {
            "POLLEN_BENCH_PLATFORM": "cpu",
            "POLLEN_BENCH_STEPS": str(2**14),
            "POLLEN_BENCH_SEGS": str(2**10),
            "POLLEN_BENCH_PATHS": "16",
            # 130 s: the wedged attempt 1 gets ~48 s before the kill
            # (enough to prove the timeout path, cheap enough for the
            # default suite), attempt 2 ~30 s for the real cpu
            # measurement at 2^14 steps.
            "POLLEN_BENCH_DEADLINE": "130",
            "POLLEN_BENCH_TRIES": "2",
            "POLLEN_BENCH_TEST_STALL": "1",  # attempt 1 hangs forever
            "POLLEN_BENCH_ROOFLINE_BUDGET": "1",
        },
        timeout=200,
    )
    assert "timed out (attempt 1" in proc.stderr, proc.stderr[-2000:]
    assert rec["value"] > 0, proc.stderr[-2000:]


def test_bench_emits_one_json_line():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        POLLEN_BENCH_PLATFORM="cpu",
        POLLEN_BENCH_STEPS=str(2**14),
        POLLEN_BENCH_SEGS=str(2**10),
        POLLEN_BENCH_PATHS="16",
        POLLEN_BENCH_DEADLINE="180",
        # Starve the roofline phase: the line must still appear (with
        # the nominal-peak fallback or a cached cpu calibration).
        POLLEN_BENCH_ROOFLINE_BUDGET="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "masked_depth_steps_per_s"
    assert rec["unit"] == "steps/s"
    assert rec["value"] > 0
    assert 0 <= rec["vs_baseline"]
