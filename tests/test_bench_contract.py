"""Driver contract for bench.py (BENCH_r03 regression: rc=124/parsed=null).

The driver runs ``python bench.py`` under a timeout and parses stdout for
ONE JSON line. bench.py must therefore (a) print the headline JSON
immediately after the first measured variant — before any optional phase —
(b) keep stdout otherwise clean, and (c) exit 0 even when the wall-clock
budget for the extras is already spent."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_one_json_line_and_exits_zero_with_spent_budget(tmp_path):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        # budget already spent: every optional phase must be skipped and
        # the process must still print the headline JSON and exit 0
        "BENCH_BUDGET_S": "0",
    })
    out_path = tmp_path / "stdout.txt"
    err_path = tmp_path / "stderr.txt"
    # file-backed stdio: an undrained PIPE deadlocks when the compile-cache
    # warnings flood stderr past the 64 KB pipe buffer (working notes)
    with open(out_path, "w") as out_f, open(err_path, "w") as err_f:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            stdout=out_f, stderr=err_f, env=env, cwd=REPO, timeout=1200,
        )
    stdout = out_path.read_text()
    stderr = err_path.read_text()
    assert proc.returncode == 0, stderr[-2000:]
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be exactly one line: {lines}"
    parsed = json.loads(lines[0])
    assert parsed["unit"] == "images/sec/chip"
    assert parsed["value"] > 0
    assert "vs_baseline" in parsed
    # the optional phases were skipped, not run: their stderr markers absent
    assert "budget spent" in stderr
    assert "tracking overhead:" not in stderr
