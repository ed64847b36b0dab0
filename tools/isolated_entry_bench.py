#!/usr/bin/env python3
"""Isolated re-measure of one catalog entry — the SCALE.md r8 gate
protocol's first-flag step: 4 cache-cleared executions in ONE session
(run 1 pays JIT; the isolated value is the median of runs 2-4).

Usage: python tools/isolated_entry_bench.py ENTRY [N_RUNS] [SF_DIR]
Prints one JSON line:
  {"entry": ..., "sf": ..., "runs": [t1..tN], "isolated_median": t}
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def measure_entry(spark, entry: str, n_runs: int, sf_dir: str) -> dict:
    """The isolated protocol as a reusable function: ``n_runs``
    cache-cleared executions, median of runs 2..n (run 1 pays JIT).
    Shared with tools/refresh_baseline.py (VERDICT r11 item 7) and
    bench_regression's --adjudicate-small path."""
    from rust_evm_indexer_spark.catalog import CATALOG, clear_session_caches

    runs: list[float] = []
    for _ in range(n_runs):
        clear_session_caches()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        CATALOG[entry].fn(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    tail = runs[1:] if len(runs) > 1 else runs
    return {
        "entry": entry,
        "sf": float(Path(sf_dir).name.replace("sf", "")),
        "runs": runs,
        "isolated_median": round(statistics.median(tail), 3),
    }


def main() -> None:
    entry = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from rust_evm_indexer_spark.catalog import CATALOG
    from rust_evm_indexer_spark.session import get_spark

    if entry not in CATALOG:
        raise SystemExit(f"unknown entry {entry!r}")
    spark = get_spark("isolated_bench")
    print(json.dumps(measure_entry(spark, entry, n_runs, sf_dir)))


if __name__ == "__main__":
    main()
