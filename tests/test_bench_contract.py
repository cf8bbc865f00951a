"""The driver contract: bench.py prints exactly one JSON line with the
required keys, under its deadline, even when phases are degraded."""

import json
import os
import subprocess
import sys


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
