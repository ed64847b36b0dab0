"""Measure the clustered-projection tier: per-address history latency on
a many-fragment store where the address appears in EVERY base fragment —
the regime where neither min/max stats nor blooms can prune the base
scan (a hot contract's full history), i.e. exactly what the projection
exists for.

Times three access paths for "all rows for address X ordered by block":

  1. base full scan        — read() + filter (blooms keep all fragments:
                             the address is genuinely everywhere)
  2. projection-routed     — get_logs-style routing via read_projection
  3. refresh cost          — fold a delta commit in, then re-probe

Prints one JSON line.  Run: python tools/projection_bench.py [fragments] [rows]
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
N_ADDRS = 1_000  # every address appears in every fragment


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = Path(tempfile.mkdtemp(prefix="proj_bench_"))
    store = TableStore(spark, root, bloom_columns={"pts": ("addr",)})

    t0 = time.perf_counter()
    for b in range(FRAGMENTS):
        df = spark.range(ROWS_PER).select(
            (F.lit(b) * ROWS_PER + F.col("id")).alias("id"),
            F.concat(F.lit("0x"), F.lpad(F.hex(F.col("id") % N_ADDRS), 8, "0")).alias(
                "addr"
            ),
            (F.lit(b * 100) + (F.col("id") % 100)).alias("block_number"),
        )
        store.commit({"pts": df})
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_proj = store.build_projection("pts", "by_addr", ("addr",), max_fragments=8)
    project_s = time.perf_counter() - t0

    probe = "0x" + f"{N_ADDRS // 2:x}".upper().zfill(8)
    expect = FRAGMENTS * (ROWS_PER // N_ADDRS)

    def timed(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            n = fn()
            best = min(best, time.perf_counter() - t)
        return best, n

    def history(df):
        return df.where(F.col("addr") == probe).orderBy("block_number", "id").count()

    base_s, n_base = timed(lambda: history(store.read("pts")))
    # bloom path: the address is in every fragment, so blooms keep all —
    # honest control showing the bloom tier is the wrong tool here
    bloom_s, n_bloom = timed(
        lambda: history(store.read("pts", equals={"addr": probe}))
    )
    proj_s, n_p = timed(
        lambda: history(store.read_projection("pts", "by_addr", key_equals=probe))
    )
    assert n_base == n_bloom == n_p == expect, (n_base, n_bloom, n_p, expect)

    files_base = len(store.read("pts").inputFiles())
    files_proj = len(
        store.read_projection("pts", "by_addr", key_equals=probe).inputFiles()
    )

    # z-order projection: two-dimension probe (addr + narrow block range).
    # The range projection's key sort makes every fragment span all
    # blocks, so the block bound prunes nothing there; z-order tiles
    # bound both dimensions and prune multiplicatively.
    t0 = time.perf_counter()
    store.build_projection(
        "pts", "z_addr_block", zorder_by=("addr", "block_number"),
        max_fragments=8,
    )
    zproject_s = time.perf_counter() - t0
    blk_lo, blk_hi = 0, (FRAGMENTS * 100) // 4  # first quarter of blocks

    def history2(df):
        return (
            df.where(
                (F.col("addr") == probe)
                & F.col("block_number").between(blk_lo, blk_hi)
            )
            .orderBy("block_number", "id")
            .count()
        )

    range2_s, n_r2 = timed(
        lambda: history2(
            store.read_projection("pts", "by_addr", key_equals=probe)
        )
    )
    z2_s, n_z2 = timed(
        lambda: history2(
            store.read_projection(
                "pts", "z_addr_block", key_equals=probe,
                min_block=blk_lo, max_block=blk_hi,
            )
        )
    )
    assert n_r2 == n_z2, (n_r2, n_z2)
    files_range2 = len(
        store.read_projection("pts", "by_addr", key_equals=probe).inputFiles()
    )
    files_z2 = len(
        store.read_projection(
            "pts", "z_addr_block", key_equals=probe,
            min_block=blk_lo, max_block=blk_hi,
        ).inputFiles()
    )
    # the OTHER query class on the same layouts: a block-range scan with
    # no key.  The range projection's key sort spreads every block over
    # every fragment (prunes nothing); z-order tiles bound the block
    # axis too — the point of z-order is ONE layout serving both
    # classes at ~sqrt(f) each, not beating a dedicated single-column
    # index at its own probe.
    files_blk_range = len(
        store.read_projection(
            "pts", "by_addr", min_block=blk_lo, max_block=blk_hi
        ).inputFiles()
    )
    files_blk_z = len(
        store.read_projection(
            "pts", "z_addr_block", min_block=blk_lo, max_block=blk_hi
        ).inputFiles()
    )
    store.drop_projection("pts", "z_addr_block")  # keep refresh section as-is

    # delta commit + incremental refresh
    delta = spark.range(ROWS_PER).select(
        (F.lit(FRAGMENTS) * ROWS_PER + F.col("id")).alias("id"),
        F.concat(F.lit("0x"), F.lpad(F.hex(F.col("id") % N_ADDRS), 8, "0")).alias(
            "addr"
        ),
        (F.lit(FRAGMENTS * 100) + (F.col("id") % 100)).alias("block_number"),
    )
    store.commit({"pts": delta})
    t0 = time.perf_counter()
    store.refresh_projection("pts", "by_addr", max_fragments=2)
    refresh_s = time.perf_counter() - t0
    post_s, n_post = timed(
        lambda: history(store.read_projection("pts", "by_addr", key_equals=probe))
    )
    assert n_post == expect + ROWS_PER // N_ADDRS

    print(
        json.dumps(
            {
                "metric": "projection_address_history",
                "fragments": FRAGMENTS,
                "rows_total": FRAGMENTS * ROWS_PER,
                "rows_per_address": expect,
                "store_build_sec": round(build_s, 2),
                "projection_build_sec": round(project_s, 2),
                "proj_fragments": n_proj,
                "history_base_sec": round(base_s, 4),
                "history_bloom_sec": round(bloom_s, 4),
                "history_projection_sec": round(proj_s, 4),
                "speedup_vs_base": round(base_s / proj_s, 2),
                "files_base": files_base,
                "files_projection": files_proj,
                "zorder_build_sec": round(zproject_s, 2),
                "twodim_range_proj_sec": round(range2_s, 4),
                "twodim_zorder_proj_sec": round(z2_s, 4),
                "twodim_speedup": round(range2_s / z2_s, 2),
                "files_twodim_range": files_range2,
                "files_twodim_zorder": files_z2,
                "files_blockscan_range_proj": files_blk_range,
                "files_blockscan_zorder_proj": files_blk_z,
                "refresh_sec": round(refresh_s, 2),
                "history_after_refresh_sec": round(post_s, 4),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
