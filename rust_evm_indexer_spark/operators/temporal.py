"""Temporal join operators Spark lacks natively: as-of join and
bounded range (interval) join.

**As-of join** — for each left row, the latest right row with
``right.ts <= left.ts`` per key.  Implemented as a union + window scan
(the classic distributed formulation): tag both sides, union, sort within
key by (ts, side-priority), and carry the last-seen right row forward
with ``last(..., ignorenulls=True)``.  ONE shuffle on the key — same
cost as a plain equi-join; no per-group Python, no ``merge_asof`` UDF
needed.  At 100 TB this beats the broadcast/nested alternatives because
both sides stream through a single keyed sort.

**Range join** — pairs within a time window (``0 <= l.ts - r.ts <=
bound``).  The naive inequality join is a cross product per key; the
scale formulation buckets time into ``bound``-sized cells so each left
row equi-joins only its own and the previous bucket, then applies the
exact predicate.  Shuffle volume ∝ events-per-bucket, not per-key².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    *,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row (by ``ts``) at-or-before each
    left row's ``ts``, matched on ``key``.  Right-side payload columns are
    suffixed.  Ties on (key, ts): the right row sorts first, so a
    same-timestamp right row IS visible to the left row (``<=``).

    ``tiebreaker`` (a right-side column name, e.g. its event id) makes
    tie resolution deterministic: when several right rows share
    (key, ts), the carried row is the one with the GREATEST tiebreaker —
    without it, ``last()`` picks whichever row the shuffle happened to
    order last, which diverges across runs/engines."""
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        key,
        ts,
        *[F.col(c).alias(c + suffix) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreaker is not None:
        # right rows order by tiebreaker ASC → last() carries the max;
        # left rows (null here) sort first within their ts+side group,
        # which is irrelevant: their carried value only depends on the
        # rows before them, and _side already orders rights first.
        order.append(F.col(tiebreaker + suffix).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix + "_f")
            for c in right_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).drop(
        "_side", *[c + suffix for c in right_cols]
    )
    for c in right_cols:
        out = out.withColumnRenamed(c + suffix + "_f", c + suffix)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    *,
    bound_seconds: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs on ``key`` with
    ``0 <= left.ts - right.ts <= bound_seconds``.

    Bucketized: each side is assigned ``floor(ts / bound)`` cells; a left
    row can only match right rows in its own or the previous cell, so the
    join is an equi-join on (key, cell) over two generated cell ids —
    the cross-product blowup of a raw inequality join never materializes.
    """
    bound_us = bound_seconds * 1_000_000
    l_us = ts_micros(F.col(ts))
    l = left.select(
        key,
        F.col(ts).alias("l_ts"),
        l_us.alias("l_us"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
    )
    r = right.select(
        key,
        ts_micros(F.col(ts)).alias("r_us"),
        *[
            F.col(c).alias(right_prefix + c)
            for c in right.columns
            if c not in (key, ts)
        ],
    ).withColumn("cell", (F.col("r_us") / bound_us).cast("long"))
    # left explodes to its two candidate cells — constant factor 2, not N
    l2 = l.withColumn(
        "cell",
        F.explode(
            F.array(
                (F.col("l_us") / bound_us).cast("long"),
                (F.col("l_us") / bound_us).cast("long") - 1,
            )
        ),
    )
    joined = l2.join(r, [key, "cell"])
    delta = F.col("l_us") - F.col("r_us")
    return (
        joined.where((delta >= 0) & (delta <= bound_us))
        .withColumn("delta_us", delta)
        .drop("cell", "l_us", "r_us")
    )


def gapfill_locf(
    df: DataFrame,
    ts: str,
    keys: list[str],
    value_col: str,
    *,
    bucket: str = "hour",
    bucket_us: int = 3_600_000_000,
    value_alias: str = "filled_value",
) -> DataFrame:
    """Hypertable-style gap-filled rollup: bucket ``ts``, aggregate, then
    densify onto a complete per-key time spine and carry the last
    observation forward (LOCF) into empty buckets — the
    ``time_bucket_gapfill`` / ``locf`` shape continuous dashboards need,
    which a plain groupBy cannot produce (absent buckets simply don't
    exist in its output).

    Scale shape: the heavy aggregation is ONE partial-aggregated shuffle
    over the raw data; everything after operates on |buckets| x |keys|
    rows.  The spine is generated distributed (``sequence`` over the
    global bound row broadcast onto the key list — no driver
    round-trip), and the LOCF window sorts only the tiny densified grid.
    Sums stay DECIMAL through the window and cast to double at the end,
    so partial-aggregation order cannot perturb the value hash.

    Output: ``(bucket_us_col, *keys, n, value_alias)`` where ``n`` is 0
    and ``value_alias`` the carried-forward (or 0 before any
    observation) aggregate for gap buckets.
    """
    bucket_col = f"{bucket}_us"
    agg = df.groupBy(
        ts_micros(F.date_trunc(bucket, F.col(ts))).alias(bucket_col), *keys
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_sv"),
    )
    bounds = agg.groupBy().agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_us))
        ).alias(bucket_col)
    )
    # key set from the tiny agg frame, not a second scan+shuffle of the
    # raw table — any key present in df is present in agg by construction
    grid = spine.crossJoin(agg.select(*keys).distinct())
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, [bucket_col, *keys], "left")
        .withColumn("n", F.coalesce(F.col("_n"), F.lit(0)).cast("bigint"))
        .withColumn(
            value_alias,
            F.coalesce(
                F.last("_sv", ignorenulls=True).over(w), F.lit(0).cast("decimal(18,2)")
            ).cast("double"),
        )
        .drop("_n", "_sv")
    )
