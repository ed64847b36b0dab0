"""Measure the dictionary index tier: event-signature (topic0-shaped)
equality lookups on a many-fragment store, full-scan vs dict-pruned.

Builds FRAGMENTS fragments x ROWS_PER rows where each fragment carries a
small, era-correlated subset of SIGS signatures (contracts deploy over
time, so a signature is emitted only in the block ranges where its
contract is live — the real-chain shape that makes per-fragment distinct
sets sparse).  Times an equality lookup for a signature present in only
a few eras:

  1. full scan        — read() + filter over every fragment
  2. dict-pruned      — read(equals=...) + the same filter (pruning is
                        manifest-inline: ZERO sidecar I/O, no false
                        positives)

Prints one JSON line.  Run: python tools/dict_bench.py [fragments] [rows]
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

FRAGMENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ROWS_PER = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
SIGS = 16  # distinct signatures table-wide
SIGS_PER_FRAG = 4  # live signatures per era (fragment)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="dict_bench_"))
    store = TableStore(
        spark, root, bloom_columns={}, dict_columns={"pts": ("sig",)}
    )

    t0 = time.perf_counter()
    for b in range(FRAGMENTS):
        df = spark.range(ROWS_PER).select(
            (F.lit(b) * ROWS_PER + F.col("id")).alias("id"),
            F.concat(
                F.lit("0xsig"),
                F.lpad(((F.col("id") % SIGS_PER_FRAG) + b) % SIGS, 2, "0"),
            ).alias("sig"),
            (F.lit(100 + b)).alias("block_number"),
        )
        store.commit({"pts": df})
    build_s = time.perf_counter() - t0

    # a signature live in SIGS_PER_FRAG consecutive eras out of FRAGMENTS
    probe = "0xsig07"
    t0 = time.perf_counter()
    full = store.read("pts")
    n_full = full.filter(F.col("sig") == probe).count()
    full_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pruned = store.read("pts", equals={"sig": probe})
    n_pruned = pruned.filter(F.col("sig") == probe).count()
    dict_s = time.perf_counter() - t0
    assert n_full == n_pruned

    frags_kept = len({f.rsplit("/", 2)[-2] for f in pruned.inputFiles()})
    frags_full = len({f.rsplit("/", 2)[-2] for f in full.inputFiles()})

    print(
        json.dumps(
            {
                "fragments": FRAGMENTS,
                "rows_total": FRAGMENTS * ROWS_PER,
                "store_build_sec": round(build_s, 2),
                "lookup_full_scan_sec": round(full_s, 4),
                "lookup_dict_sec": round(dict_s, 4),
                "speedup": round(full_s / dict_s, 2),
                "frags_full": frags_full,
                "frags_dict": frags_kept,
                "rows_matched": n_full,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
