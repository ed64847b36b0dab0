"""Measure the bloom index tier: point-lookup latency and targeted-delete
cost on a many-fragment store, full-scan vs bloom-pruned.

Builds a store with FRAGMENTS fragments x ROWS_PER rows (disjoint
block ranges, mostly-disjoint address sets — the shape streaming ingest
produces), then times:

  1. full-scan point lookup   — read() + filter over every fragment
  2. bloom-pruned lookup      — read(equals=...) + the same filter
  3. delete_equals            — bloom-bounded targeted deletion

Prints one JSON line.  Run: python tools/bloom_bench.py [fragments] [rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

from rust_evm_indexer_spark.store import TableStore

FRAGMENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ROWS_PER = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="bloom_bench_"))
    store = TableStore(spark, root, bloom_columns={"pts": ("addr",)})

    t0 = time.perf_counter()
    for b in range(FRAGMENTS):
        df = spark.range(ROWS_PER).select(
            (F.lit(b) * ROWS_PER + F.col("id")).alias("id"),
            F.concat(
                F.lit(f"0xf{b:03x}"), F.lpad(F.hex(F.col("id")), 8, "0")
            ).alias("addr"),
            (F.lit(b * 100) + (F.col("id") % 100)).alias("block_number"),
        )
        store.commit({"pts": df})
    build_s = time.perf_counter() - t0

    probe = f"0xf{FRAGMENTS // 2:03x}" + f"{1234:08X}".lower().replace("x", "")
    # derive the probe from actual data so it definitely exists
    probe = (
        store.read("pts")
        .where(F.col("block_number") == (FRAGMENTS // 2) * 100 + 34)
        .select("addr")
        .first()[0]
    )

    def timed(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            n = fn()
            best = min(best, time.perf_counter() - t)
        return best, n

    full_s, n_full = timed(
        lambda: store.read("pts").where(F.col("addr") == probe).count()
    )
    bloom_s, n_bloom = timed(
        lambda: store.read("pts", equals={"addr": probe})
        .where(F.col("addr") == probe)
        .count()
    )
    assert n_full == n_bloom == 1, (n_full, n_bloom)
    n_files_full = len(store.read("pts").inputFiles())
    n_files_bloom = len(store.read("pts", equals={"addr": probe}).inputFiles())

    t = time.perf_counter()
    dstats = store.delete_equals("pts", "addr", probe)
    delete_s = time.perf_counter() - t

    print(
        json.dumps(
            {
                "metric": "bloom_point_lookup",
                "fragments": FRAGMENTS,
                "rows_total": FRAGMENTS * ROWS_PER,
                "store_build_sec": round(build_s, 2),
                "lookup_full_scan_sec": round(full_s, 4),
                "lookup_bloom_sec": round(bloom_s, 4),
                "speedup": round(full_s / bloom_s, 2),
                "files_full": n_files_full,
                "files_bloom": n_files_bloom,
                "delete_sec": round(delete_s, 2),
                "delete_stats": dstats,
            }
        )
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
