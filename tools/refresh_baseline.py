#!/usr/bin/env python3
"""Rewrite the committed steady baseline's SMALL entries as isolated
medians (VERDICT r11 item 7 — the root cause of every bench-gate
flapping episode).

Why: the regression gate compares per-entry steady times against the
HEAD-committed ``bench_result_steady.json``, and each committed value
is a SINGLE sample.  At the 1-3 s scale the documented noise is ±30%,
so a committed sample that happened to be a favorable outlier (-30%)
flags every merely-typical re-run at ~1.4x — three rounds produced
manual adjudications exactly there (q2 r8, q17/q20 r10), and the r11
fix widened the small-band threshold to 1.9x, trading resolution for
stability.  This tool removes the root cause instead: after a normal
``python bench.py --steady`` run, each entry in the gate's small band
([1 s, 3 s)) is re-measured with the isolated protocol (4 cache-cleared
same-session executions, median of the last 3 —
tools/isolated_entry_bench.py) and the MEDIAN replaces the single
sample in the sidecar before it is committed.  Medians are stable
centers, so the committed baseline can no longer BE an outlier, and
fresh runs gate cleanly against it.

Only the steady sidecar is rewritten: "cold" means first-execution by
definition, so substituting a cache-cleared-but-JIT-warm median there
would mislabel the regime; the cold file stays a true cold sample and
the gate never reads it.

The substituted entries are recorded in the sidecar
(``small_band_isolated``: entry -> {raw, runs}) so a reader can always
tell a measured-single value from an isolated median.  Entries whose
isolated runs sit far ABOVE the raw steady sample are steady-warmth
coupled (shared session caches built by earlier entries) — for those
the isolated median measures a DIFFERENT regime than the gate compares,
so the raw value is kept and the decision recorded under ``kept_raw``
(r12 review).

Usage:
    python bench.py --steady           # produce the fresh sidecars
    python tools/refresh_baseline.py   # substitute small-band medians
    git add bench_result_steady.json   # commit as the new baseline
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

STEADY = REPO / "bench_result_steady.json"
FLOOR_SEC = 1.0   # keep in lockstep with tools/bench_regression.py
SMALL_BAND_SEC = 3.0


def main() -> None:
    path = Path(sys.argv[1]) if len(sys.argv) > 1 else STEADY
    sidecar = json.loads(path.read_text())
    if sidecar.get("pass_index", 3) != 3:
        raise SystemExit(
            "refusing: the sidecar is not a protocol-3 steady file "
            f"(pass_index={sidecar.get('pass_index')})"
        )
    sf_dir = f"/root/testdata/sf{sidecar['sf']}"
    small = sorted(
        n for n, t in sidecar["queries"].items()
        if FLOOR_SEC <= t < SMALL_BAND_SEC
    )
    if not small:
        print("no entries in the small band; sidecar unchanged")
        return

    from isolated_entry_bench import measure_entry

    from rust_evm_indexer_spark.session import get_spark

    spark = get_spark("refresh_baseline")
    isolated: dict[str, dict] = {}
    for i, name in enumerate(small, 1):
        raw = sidecar["queries"][name]
        m = measure_entry(spark, name, 4, sf_dir)
        med, runs = m["isolated_median"], m["runs"]
        # Substitute only when the isolated median estimates the SAME
        # quantity the gate compares (a fresh steady-sequence run).
        # A raw sample far BELOW every isolated run is not an outlier —
        # it is deterministic steady-sequence warmth (shared caches
        # built by earlier entries; e.g. lm_stupid_backoff_tri runs
        # ~2.8s in sequence vs ~5.7s isolated), and replacing it would
        # recenter the gate 2x high, silently passing real steady
        # regressions (r12 review).  Keep raw there: warmth is
        # reproducible, so the single sample is a stable center.  A raw
        # far ABOVE the runs was a slow outlier — the median is the
        # better (and detection-safer, lower) center.
        lo = min(runs[1:]) if len(runs) > 1 else runs[0]
        if raw < lo / 1.3:
            isolated[name] = {
                "raw_steady": raw, "runs": runs,
                "kept_raw": "steady-warmth-coupled (raw << isolated)",
            }
            print(
                f"[{i}/{len(small)}] {name}: {raw:.2f}s steady KEPT "
                f"(isolated median {med:.2f}s is a different regime; "
                f"runs {runs})",
                file=sys.stderr,
            )
            continue
        sidecar["queries"][name] = med
        isolated[name] = {"raw_steady": raw, "runs": runs}
        print(
            f"[{i}/{len(small)}] {name}: {raw:.2f}s steady sample -> "
            f"{med:.2f}s isolated median (runs {runs})",
            file=sys.stderr,
        )
    sidecar["small_band_isolated"] = isolated
    sidecar["value"] = round(sum(sidecar["queries"].values()), 4)
    path.write_text(json.dumps(sidecar, indent=1) + "\n")
    print(
        f"rewrote {len(isolated)} small-band entries in {path.name}; "
        f"new total {sidecar['value']}s"
    )


if __name__ == "__main__":
    main()
