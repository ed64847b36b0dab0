"""The steady-state bench regression gate (tools/bench_regression.py):
pure file-compare logic, no Spark."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

TOOL = Path(__file__).resolve().parents[1] / "tools" / "bench_regression.py"


def _run(tmp_path, base_q, cur_q, base_sf=0.1, cur_sf=0.1):
    base = tmp_path / "base.json"
    cur = tmp_path / "cur.json"
    base.write_text(json.dumps({"sf": base_sf, "queries": base_q}))
    cur.write_text(json.dumps({"sf": cur_sf, "queries": cur_q}))
    p = subprocess.run(
        [sys.executable, str(TOOL), "--baseline", str(base),
         "--current", str(cur)],
        capture_output=True, text=True,
    )
    return p.returncode, p.stdout


def test_no_regression_passes(tmp_path):
    rc, out = _run(tmp_path, {"a": 2.0, "b": 5.0}, {"a": 2.1, "b": 4.0})
    assert rc == 0 and "OK" in out


def test_regression_flagged(tmp_path):
    rc, out = _run(tmp_path, {"a": 2.0}, {"a": 3.0})
    assert rc == 2 and "a" in out and "1.50x" in out


def test_subsecond_baseline_ignored(tmp_path):
    # 0.2s -> 0.9s is 4.5x but below the 1s floor: scheduler noise
    rc, out = _run(tmp_path, {"a": 0.2}, {"a": 0.9})
    assert rc == 0


def test_new_entry_reported_not_gated(tmp_path):
    rc, out = _run(tmp_path, {"a": 2.0}, {"a": 2.0, "z": 50.0})
    assert rc == 0 and "new entries" in out and "z" in out


def test_cross_sf_comparison_is_vacuous(tmp_path):
    # a smoke run at another SF must never masquerade as a regression
    rc, out = _run(tmp_path, {"a": 2.0}, {"a": 9.0}, base_sf=0.001)
    assert rc == 0 and "cross-SF" in out
