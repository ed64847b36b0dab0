"""Measure Z-order compaction: fragment pruning for BOTH dimensions of a
(block_number, addr) workload, against the block-sorted baseline.

Builds one ingest-shaped table (uniform addresses in every block batch),
compacts it two ways, and times the two hot query shapes on each layout:

  A. block-sorted compaction (sort_within=addr)   — baseline
  B. z-order compaction      (zorder_by=(block_number, addr))

  q1. address point lookup  — read(equals={"addr": probe}) + filter
  q2. narrow block range    — read(min_block, max_block) + filter

Expectation: q2 is good on both (manifest min/max tier; z ranges ~√f
wider), q1 prunes ONLY on the z layout — in the block-sorted layout
every fragment spans the full address space, so blooms keep everything.

Prints one JSON line.  Run: python tools/zorder_bench.py [fragments] [rows]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

from rust_evm_indexer_spark.store import TableStore

FRAGMENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROWS_PER = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000


def _build(spark, root: Path) -> TableStore:
    store = TableStore(
        spark, root, bloom_columns={"pts": ("addr",)}, dict_columns={}
    )
    for b in range(FRAGMENTS):
        # addresses uniform across the space in EVERY batch — the shape
        # that defeats single-dimension clustering
        df = spark.range(ROWS_PER).select(
            (F.lit(b) * ROWS_PER + F.col("id")).alias("id"),
            F.concat(
                F.lit("0x"),
                F.lpad(
                    F.lower(F.hex((F.col("id") * 2654435761) % (1 << 48))),
                    12,
                    "0",
                ),
            ).alias("addr"),
            (F.lit(100 + b)).alias("block_number"),
        )
        store.commit({"pts": df})
    return store


def _frag_dirs(df) -> int:
    return len({f.rsplit("/", 2)[-2] for f in df.inputFiles()})


def _time_queries(store: TableStore, probe: str, blk: int) -> dict:
    t0 = time.perf_counter()
    q1 = store.read("pts", equals={"addr": probe})
    n1 = q1.filter(F.lower(F.col("addr")) == probe).count()
    t1 = time.perf_counter()
    q2 = store.read("pts", min_block=blk, max_block=blk)
    n2 = q2.filter(F.col("block_number") == blk).count()
    t2 = time.perf_counter()
    return {
        "addr_lookup_sec": round(t1 - t0, 4),
        "addr_rows": n1,
        "addr_frags_kept": _frag_dirs(q1),
        "block_range_sec": round(t2 - t1, 4),
        "block_rows": n2,
        "block_frags_kept": _frag_dirs(q2),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"fragments": FRAGMENTS, "rows_total": FRAGMENTS * ROWS_PER}
    # the address space repeats per batch (hot addresses appear in every
    # block — the regime single-dimension clustering can't prune), so
    # the probe recurs once per original fragment
    probe_id = ROWS_PER // 2
    probe = f"0x{(probe_id * 2654435761) % (1 << 48):012x}"
    blk = 100 + FRAGMENTS // 2

    for label, kwargs in (
        ("block_sorted", {"sort_within": ("addr",)}),
        ("zorder", {"zorder_by": ("block_number", "addr")}),
    ):
        root = Path(tempfile.mkdtemp(prefix=f"zorder_bench_{label}_"))
        try:
            store = _build(spark, root)
            t0 = time.perf_counter()
            store.compact("pts", max_fragments=8, **kwargs)
            out[label] = {
                "compact_sec": round(time.perf_counter() - t0, 2),
                **_time_queries(store, probe, blk),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out["addr_speedup_z_vs_sorted"] = round(
        out["block_sorted"]["addr_lookup_sec"] / out["zorder"]["addr_lookup_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
