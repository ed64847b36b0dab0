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
    # a genuine 1.5x regression on a 5s entry exits 2 (VERDICT r10
    # item 4's negative control: the small-entry band must not have
    # loosened the gate where the signal is real)
    rc, out = _run(tmp_path, {"a": 5.0}, {"a": 7.5})
    assert rc == 2 and "a" in out and "1.50x" in out


def test_small_band_favorable_outlier_no_longer_flags(tmp_path):
    """VERDICT r10 item 4: a 1-3s committed baseline that was a
    favorable cold-pass outlier (-30% of the true median) must not flag
    on a merely-typical re-run (the q2 r8 / q17+q20 r10 flapping).
    1.4s -> 2.2s is 1.57x — noise arithmetic at this scale, green."""
    rc, out = _run(tmp_path, {"q17": 1.4, "b": 6.0}, {"q17": 2.2, "b": 6.1})
    assert rc == 0 and "OK" in out


def test_small_band_still_flags_beyond_noise_envelope(tmp_path):
    # 2.0s -> 4.0s (2.0x) exceeds even outlier-vs-outlier noise
    # (1.3/0.7 ≈ 1.86) — a real plan change, still gated
    rc, out = _run(tmp_path, {"a": 2.0}, {"a": 4.0})
    assert rc == 2 and "2.00x" in out


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


def _run_args(tmp_path, base_q, cur_q, *extra):
    base = tmp_path / "base.json"
    cur = tmp_path / "cur.json"
    base.write_text(json.dumps({"sf": 0.1, "queries": base_q}))
    cur.write_text(json.dumps({"sf": 0.1, "queries": cur_q}))
    p = subprocess.run(
        [sys.executable, str(TOOL), "--baseline", str(base),
         "--current", str(cur), *extra],
        capture_output=True, text=True,
    )
    return p.returncode, p.stdout


def _r9_scenario():
    """The recorded r9 shape: 13 flags at a uniform 1.3-1.5x across
    disjoint untouched entries, with the rest of the run drifted the
    same direction (median well above 1.1x)."""
    import random

    rng = random.Random(9)
    base, cur = {}, {}
    for i in range(13):  # the 13 uniform flags
        t0 = 2.0 + i * 0.5
        base[f"flag{i}"] = t0
        cur[f"flag{i}"] = t0 * rng.uniform(1.32, 1.48)
    for i in range(23):  # the rest: same-direction drift, below 1.3x
        t0 = 1.5 + i * 0.3
        base[f"ok{i}"] = t0
        cur[f"ok{i}"] = t0 * rng.uniform(1.10, 1.28)
    return base, cur


def test_r9_uniform_shift_classified_environmental(tmp_path):
    """VERDICT r9 item 4: the hand-made adjudication, replayed through
    the tool — 13 uniform flags + whole-run drift = host-throughput
    shift.  Exit 3 (not 2) without the explicit acceptance flag."""
    base, cur = _r9_scenario()
    rc, out = _run_args(tmp_path, base, cur)
    assert rc == 3 and "ENVIRONMENTAL SHIFT" in out
    assert "--accept-environmental" in out


def test_environmental_acceptance_passes_gate(tmp_path):
    base, cur = _r9_scenario()
    rc, out = _run_args(tmp_path, base, cur, "--accept-environmental")
    assert rc == 0 and "refreshed baseline" in out


def test_single_entry_flag_still_fails_as_regression(tmp_path):
    """One 1.4x flag on an otherwise-flat run is a real regression —
    never waved as environmental."""
    base = {f"ok{i}": 2.0 + i for i in range(20)}
    cur = {k: v * 1.02 for k, v in base.items()}
    base["hot"] = 5.0
    cur["hot"] = 7.0  # 1.4x
    rc, out = _run_args(tmp_path, base, cur)
    assert rc == 2 and "STEADY REGRESSIONS" in out and "hot" in out
    # and acceptance must NOT wave a per-entry regression through
    rc2, _ = _run_args(tmp_path, base, cur, "--accept-environmental")
    assert rc2 == 2


def test_nonuniform_mass_flags_stay_per_entry(tmp_path):
    """Many flags whose ratios span widely (1.3x next to 3x) are NOT a
    uniform host shift — each needs a named cause."""
    base = {f"e{i}": 3.0 for i in range(10)}
    cur = {f"e{i}": 3.0 * (1.31 + 0.2 * i) for i in range(10)}
    rc, out = _run_args(tmp_path, base, cur)
    assert rc == 2 and "STEADY REGRESSIONS" in out


def test_uniform_flags_without_global_drift_stay_per_entry(tmp_path):
    """Six uniform flags while the other 30 entries are flat: that is a
    correlated code regression (e.g. one shared operator slowed), not
    the host — the median-drift corroboration blocks the wave."""
    base = {f"ok{i}": 2.0 + i * 0.2 for i in range(30)}
    cur = {k: v * 1.01 for k, v in base.items()}
    for i in range(6):
        base[f"flag{i}"] = 4.0
        cur[f"flag{i}"] = 4.0 * 1.4
    rc, out = _run_args(tmp_path, base, cur)
    assert rc == 2 and "STEADY REGRESSIONS" in out


def test_small_band_borderline_warns_but_passes(tmp_path):
    """ADVICE r11 low: a 1.3-1.9x ratio on a 1-3s baseline passes the
    widened gate but must stay VISIBLE — a WARN line naming the
    isolated-median adjudication, not a plain OK."""
    rc, out = _run(tmp_path, {"q17": 1.4, "b": 6.0}, {"q17": 2.2, "b": 6.1})
    assert rc == 0 and "OK" in out
    assert "WARN small-band" in out and "q17" in out
    assert "isolated_entry_bench.py q17" in out


def test_small_band_clean_run_has_no_warn(tmp_path):
    rc, out = _run(tmp_path, {"q17": 1.4, "b": 6.0}, {"q17": 1.5, "b": 6.1})
    assert rc == 0 and "WARN" not in out


def test_adjudicate_small_confirms_real_regression(tmp_path, monkeypatch):
    """--adjudicate-small re-measures each warned entry; a confirmed
    isolated median > 1.3x baseline fails the gate (exit 2).  The
    isolated bench is stubbed via a fake tool on the subprocess path —
    classify() itself is exercised pure."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_regression", TOOL)
    br = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(br)

    fake_runs = []

    def fake_run(cmd, **kw):
        fake_runs.append(cmd)
        class P:
            stdout = json.dumps({"entry": cmd[2], "isolated_median": 2.6})
        return P()

    monkeypatch.setattr(br.subprocess, "run", fake_run)
    confirmed = br._handle_small_warnings(
        [("q17", 1.4, 2.2)], {"sf": 0.1}, adjudicate=True)
    assert confirmed == [("q17", 1.4, 2.6)]
    assert fake_runs and "q17" in fake_runs[0]

    # and an isolated median back inside 1.3x clears the warning
    def fake_run_ok(cmd, **kw):
        class P:
            stdout = json.dumps({"entry": cmd[2], "isolated_median": 1.5})
        return P()

    monkeypatch.setattr(br.subprocess, "run", fake_run_ok)
    confirmed = br._handle_small_warnings(
        [("q17", 1.4, 2.2)], {"sf": 0.1}, adjudicate=True)
    assert confirmed == []


def test_environmental_path_still_surfaces_small_band_warnings(tmp_path):
    """Review r12: an accepted environmental shift must not silently
    bless a small-band (1.3-1.9x on 1-3s) drift — the WARN lines print
    on the environmental path too, naming the adjudication tool."""
    base, cur = _r9_scenario()
    rc, out = _run_args(tmp_path, base, cur, "--accept-environmental")
    assert rc == 0 and "refreshed baseline" in out
    # flag0/flag1 sit in the small band (2.0s/2.5s baselines) so they
    # are warnings, not gate regressions — and they must be VISIBLE
    assert "WARN small-band" in out
    assert "isolated_entry_bench.py" in out
