"""Stream-stream joins with watermark-bounded state (X-6).

The batch interval join (``operators/temporal.py::range_join``, driver-
verified by ``range_join_events``) answers "errors within 10 minutes of
a click" over data at rest.  The streaming version answers it as events
ARRIVE — two live streams, each row potentially matching rows that
haven't been seen yet, so the engine must buffer both sides.  Unbounded
buffering is the failure mode at 100 TB/day; three things bound it:

1. **watermarks on both sides** — state older than the watermark is
   dropped;
2. **a time-range join condition** — tells Spark exactly how long a
   left row can still find right matches (state TTL = bound + watermark
   delay, per the Structured Streaming stream-stream join contract);
3. **an equality key** — the join shuffles both streams by the key, so
   state is partitioned, never broadcast.

Outer variants additionally REQUIRE the watermark + time bound (Spark
rejects them otherwise): a NULL-padded unmatched row can only be
emitted once the watermark proves no future match can arrive.  Inner
joins without a watermark are accepted by Spark but grow state forever
— this module applies the watermark unconditionally, so every query
built here is state-bounded by construction.

The same function works in batch mode (``withWatermark`` is a no-op on
batch frames), which is how the semantics stay unit-testable and how
the batch/streaming equivalence test pins them to ``range_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    bound_seconds: int = 600,
    watermark: str = "10 minutes",
    how: str = "inner",
    ts_col: str = "ts",
) -> DataFrame:
    """Join each left event to right events by the same ``key`` whose
    timestamp falls in ``[left.ts, left.ts + bound_seconds]``.

    Output columns: ``<key>``, ``l_event_id``, ``r_event_id`` (NULL for
    unmatched left rows under ``how="leftOuter"``), ``l_ts``, ``r_ts``,
    ``delta_us``.  Streaming state is bounded by the watermark + bound
    (see module docstring); in batch mode the plan is an ordinary
    range-bucketized join and must agree with
    ``operators.temporal.range_join`` row-for-row.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {bound_seconds} SECONDS"))
    )
    return l.join(r, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("l_event_id"),
        F.col("r.event_id").alias("r_event_id"),
        lts.alias("l_ts"),
        rts.alias("r_ts"),
        (
            F.unix_micros(rts.cast("timestamp"))
            - F.unix_micros(lts.cast("timestamp"))
        ).alias("delta_us"),
    )


def start_interval_join_stream(
    spark,
    left_dir: str,
    right_dir: str,
    *,
    schema,
    key: str = "user_id",
    bound_seconds: int = 600,
    watermark: str = "10 minutes",
    how: str = "inner",
    queryName: str = "interval_join",
):
    """Wire :func:`stream_interval_join` over two parquet file streams
    into a memory sink (append mode — the only mode stream-stream joins
    support).  Callers feed files into the dirs, ``processAllAvailable``,
    and read ``SELECT * FROM {queryName}``.  Late/unmatched emission
    follows watermark advancement: an outer join's NULL rows appear only
    after a LATER batch moves the watermark past the join bound — the
    test feeds a sentinel event to force that, mirroring production
    where traffic itself advances the watermark."""
    lstream = spark.readStream.schema(schema).parquet(left_dir)
    rstream = spark.readStream.schema(schema).parquet(right_dir)
    joined = stream_interval_join(
        lstream,
        rstream,
        key=key,
        bound_seconds=bound_seconds,
        watermark=watermark,
        how=how,
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
