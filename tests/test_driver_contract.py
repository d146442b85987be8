"""Guard the driver contract: ``python bench.py`` must print ONE final JSON
line with the agreed keys (the round driver records it as BENCH_r{N}.json).

Runs the real script as a subprocess in its CPU smoke mode (tiny shapes,
interpret-mode kernels) so a refactor that breaks the JSON schema or the
script's import surface fails here instead of at round end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_smoke_emits_json_contract():
    env = dict(os.environ)
    env.update(
        BENCH_SMOKE="1",
        BENCH_PLATFORM="cpu",
        PYTHONPATH=f"{REPO}:{env.get('PYTHONPATH', '')}",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    for key in (
        "metric",
        "value",
        "unit",
        "vs_baseline",
        "mfu",
        "fixed_solve_ms",
        "time_to_tol1e4_ms",
        "config2_mixed_batch64_iters_per_s",
        "timing_fallback",
        "timing_unreliable",
    ):
        assert key in data, f"missing bench JSON key: {key}"
    assert data["unit"] == "iterations/s"
    assert data["value"] > 0
