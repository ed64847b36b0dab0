"""Stream-stream interval joins (X-6): watermark-bounded two-sided
state.  Semantics are pinned two ways — batch-mode equivalence with the
driver-verified range_join, and a live two-file-stream run whose output
must equal the batch plan over the same rows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators.temporal import range_join
from rust_evm_indexer_spark.sources.batch import load_driver_table
from rust_evm_indexer_spark.streaming import (
    start_interval_join_stream,
    stream_interval_join,
)

from conftest import SF_ORACLE

_SCHEMA = "event_id long, ts timestamp, user_id long"


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts_str string, user_id long"
    ).select("event_id", F.col("ts_str").cast("timestamp").alias("ts"), "user_id")


def test_batch_equivalence_with_range_join(spark):
    """Same pairs as the driver-verified batch interval join
    (range_join_events shape: errors within 10 min after a click)."""
    ev = load_driver_table(spark, SF_ORACLE, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    want = {
        (r["event_id"], r["r_event_id"], r["delta_us"])
        for r in range_join(errors, clicks, key="user_id", bound_seconds=600).collect()
    }
    # range_join is left=errors matching EARLIER clicks; the stream join
    # is left=clicks matching LATER errors — same pair set
    got = {
        (r["r_event_id"], r["l_event_id"], r["delta_us"])
        for r in stream_interval_join(
            clicks, errors, key="user_id", bound_seconds=600
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_inner_join_end_to_end(spark, tmp_path):
    left_rows = [
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 10:20:00", 7),
        (3, "2024-01-01 10:00:00", 8),  # other user
        (4, "2024-01-01 12:00:00", 7),  # no purchase near
    ]
    right_rows = [
        (101, "2024-01-01 10:05:00", 7),   # matches 1 (300s)
        (102, "2024-01-01 10:25:00", 7),   # matches 2 (300s); 1 is out (1500s)
        (103, "2024-01-01 09:59:00", 7),   # before every left ts — no match
        (104, "2024-01-01 10:01:00", 9),   # no such left user
    ]
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    _frame(spark, left_rows).write.parquet(str(ldir))
    _frame(spark, right_rows).write.parquet(str(rdir))

    q = start_interval_join_stream(
        spark,
        str(ldir),
        str(rdir),
        schema=_SCHEMA,
        bound_seconds=600,
        watermark="5 minutes",
        queryName="ssj_inner",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["l_event_id"], r["r_event_id"], r["delta_us"])
        for r in spark.sql("SELECT * FROM ssj_inner").collect()
    }
    want_batch = {
        (r["l_event_id"], r["r_event_id"], r["delta_us"])
        for r in stream_interval_join(
            _frame(spark, left_rows), _frame(spark, right_rows), bound_seconds=600
        ).collect()
    }
    assert got == want_batch == {(1, 101, 300_000_000), (2, 102, 300_000_000)}


@pytest.mark.slow
def test_stream_left_outer_emits_nulls_after_watermark_passes(spark, tmp_path):
    """Outer semantics are a WATERMARK property: the NULL-padded row for
    an unmatched left event may only appear once the watermark proves no
    future right match can arrive.  Sentinel batches advance it."""
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    _frame(spark, [(1, "2024-01-01 10:00:00", 7)]).write.parquet(str(ldir))
    _frame(spark, [(101, "2024-01-01 10:05:00", 7)]).write.parquet(str(rdir))

    q = start_interval_join_stream(
        spark,
        str(ldir),
        str(rdir),
        schema=_SCHEMA,
        bound_seconds=600,
        watermark="1 minute",
        how="leftOuter",
        queryName="ssj_outer",
    )
    try:
        q.processAllAvailable()
        # batch 1: the matched pair is emitted; left id=2 arrives with no
        # match and must NOT be emitted yet
        _frame(spark, [(2, "2024-01-01 10:30:00", 7)]).write.mode("append").parquet(
            str(ldir)
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT l_event_id, r_event_id FROM ssj_outer").collect()
        assert {(r[0], r[1]) for r in rows} == {(1, 101)}
        # sentinel events far past the bound advance the watermark on
        # both sides; a further batch lets the eviction emit the NULL row
        for i, t in enumerate(["2024-01-01 12:00:00", "2024-01-01 13:00:00"]):
            _frame(spark, [(900 + i, t, 99)]).write.mode("append").parquet(str(ldir))
            _frame(spark, [(950 + i, t, 99)]).write.mode("append").parquet(str(rdir))
            q.processAllAvailable()
        rows = spark.sql("SELECT l_event_id, r_event_id FROM ssj_outer").collect()
        got = {(r[0], r[1]) for r in rows}
    finally:
        q.stop()
    assert (2, None) in got, f"unmatched left row never emitted: {got}"
    assert (1, 101) in got
