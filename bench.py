"""Benchmark harness (driver contract): run the engine's headline queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (count of the materialized result —
bounded collects only), timed wall-clock after a JVM/catalog warm-up pass
so per-query numbers measure the plan, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rust_evm_indexer_spark.catalog import CATALOG  # noqa: E402
from rust_evm_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0)
    spark = get_spark("bench")

    # one cheap warm-up to absorb JVM/codegen/session startup — per-entry
    # warm-up would triple the wall time while hiding real planning cost
    CATALOG["logs_page_first"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, entry in sorted(CATALOG.items()):
        t0 = time.perf_counter()
        df = entry.fn(spark, sf_dir)
        # execute fully; count() on the final plan materializes every
        # operator (limits/sorts included) without driver-side collect
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
