#!/usr/bin/env python3
"""Round-12 optimization profiler: per-entry breakdown of where cold
wall time goes — plan construction (py4j + analysis), execution — plus
optional A/B of conf overrides and scan-parallelism experiments.

Usage:
    python tools/opt_profile.py ENTRY [ENTRY...] [--sf DIR] [--reps N]
        [--conf k=v ...]

Prints, per entry: build_s (fn() call → DataFrame), exec_s (count()),
and with --explain the formatted plan's Exchange/scan summary.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from rust_evm_indexer_spark.catalog import CATALOG, clear_session_caches
    from rust_evm_indexer_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("opt_profile", extra_conf=extra)
    for k, v in extra.items():
        spark.conf.set(k, v)

    unknown = [e for e in args.entries if e not in CATALOG]
    if unknown:
        sys.exit(f"unknown entries: {unknown}")

    # warm-up pass at sf0.001 (JIT absorb, same as bench.py protocol)
    if not args.no_warm:
        warm_sf = str(Path(args.sf).parent / "sf0.001")
        if not Path(warm_sf).is_dir():
            warm_sf = args.sf
        for e in args.entries:
            try:
                CATALOG[e].fn(spark, warm_sf).count()
            except Exception as ex:
                print(f"warm {e} failed: {ex}", file=sys.stderr)
        clear_session_caches()

    for e in args.entries:
        for rep in range(args.reps):
            clear_session_caches()
            t0 = time.perf_counter()
            df = CATALOG[e].fn(spark, args.sf)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            print(
                f"{e:40s} rep{rep} build={t1 - t0:6.3f}s exec={t2 - t1:6.3f}s total={t2 - t0:6.3f}s",
                flush=True,
            )
        if args.explain:
            from rust_evm_indexer_spark.plans.inspect import physical_plan

            plan = physical_plan(CATALOG[e].fn(spark, args.sf))
            n_ex = plan.count("Exchange")
            print(f"--- {e}: {n_ex} Exchange mentions")
            print(plan[:4000])
    spark.stop()


if __name__ == "__main__":
    main()
