"""bench.py harness robustness: the one-line JSON must survive phase failure.

Round-3 post-mortem: a wedged device call in bench_detector() meant NO json
line was emitted and the round had no perf artifact. These tests force every
phase to fail (PERSEUS_BENCH_FORCE_FAIL) and assert the harness still prints
a parseable result line with nulls for the dead phases.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_emits_json_when_all_phases_fail():
    env = dict(os.environ, PERSEUS_BENCH_FORCE_FAIL="all", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=600,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = _last_json_line(proc.stdout)
    assert result["metric"] == "detector_inference_fps_per_chip_256x256_rgbd"
    assert result["value"] is None
    assert result["train_images_per_sec"] is None
    assert "vs_baseline" in result


def test_bench_phase_subprocess_reports_forced_failure():
    env = dict(os.environ, PERSEUS_BENCH_FORCE_FAIL="detector", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, BENCH, "--phase", "detector"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=120,
        text=True,
    )
    assert proc.returncode != 0
    assert "forced failure" in proc.stderr
