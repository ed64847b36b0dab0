"""Query catalog: every operator exposed through the driver contract.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string (run by DuckDB over the same
parquet).  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin reads
of this registry, and ``tests/test_catalog_oracle.py`` replays the same
comparison locally, so green tests ⇒ green driver gate.

Naming discipline (driver compare hashes values under sorted column names):
every computed column is aliased identically in the Spark plan and the SQL.

Determinism discipline: aggregates over ``double`` columns are computed in
DecimalType (exact, order-independent — safe under Spark's parallel partial
aggregation) and only cast to double at the end; timestamps are emitted as
``unix_micros`` BIGINTs or DATEs, never raw engine-specific timestamps,
except where the raw stored value passes through unmodified.

EVM-shape mapping (FIXTURES.md §B): the reference's log-search semantics are
exercised on the driver's ``events`` table — ``event_type`` ≙ topic0,
``(ts, event_id)`` ≙ the ``(block_number, id)`` keyset-cursor tuple,
``user_id`` ≙ address — while the EVM-faithful operators run on generated
fixtures under ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.batch import load_driver_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None ⇒ non-SQL-expressible; driver does rows-only
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        CATALOG[name] = CatalogEntry(name, fn, oracle, tags)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_driver_table(spark, sf_dir, name)


# exact decimal cast for 2-decimal money/quantity columns: decimal sums are
# order-independent, so Spark's partial aggregation and DuckDB's serial sum
# agree bit-for-bit after the final cast back to double.
_DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


# =====================================================================
# EVM query shapes on `events` (O-12..O-26 analogs — SURVEY.md §2b)
# =====================================================================

_EVENT_COLS = ["event_id", "ts_us", "user_id", "event_type", "value"]
_EVENT_PROJ_SQL = "event_id, epoch_us(ts) AS ts_us, user_id, event_type, value"


def _events_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-12 analog: projection + rename + type normalization (timestamp →
    epoch micros so both engines emit identical BIGINTs)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


@register(
    "logs_page_first",
    f"SELECT {_EVENT_PROJ_SQL} FROM events ORDER BY ts, event_id LIMIT 100",
    tags=("evm-shape", "O-12", "O-17"),
)
def logs_page_first(spark, sf_dir):
    """First page: total order (ts, event_id) + top-k ⇒ Spark plans
    TakeOrderedAndProject, the distributed analog of the reference's
    index-ordered LIMIT (src/api.rs:174-175)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id")
        .limit(100)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )


@register(
    "logs_filter_eq",
    f"SELECT {_EVENT_PROJ_SQL} FROM events WHERE event_type = 'purchase'",
    tags=("evm-shape", "O-13"),
)
def logs_filter_eq(spark, sf_dir):
    """Equality filter on the topic0 analog (src/api.rs:145-160)."""
    return _events_projected(spark, sf_dir).filter(F.col("event_type") == "purchase")


@register(
    "logs_filter_conj",
    f"SELECT {_EVENT_PROJ_SQL} FROM events "
    "WHERE event_type = 'click' AND user_id = 42",
    tags=("evm-shape", "O-13", "O-15"),
)
def logs_filter_conj(spark, sf_dir):
    """Conjunctive independent equality filters (topic0 AND topic1 analog)."""
    return (
        _events_projected(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .filter(F.col("user_id") == 42)
    )


@register(
    "logs_range",
    f"SELECT {_EVENT_PROJ_SQL} FROM events "
    "WHERE event_id >= 2000 AND event_id <= 5000",
    tags=("evm-shape", "O-14"),
)
def logs_range(spark, sf_dir):
    """Block-range analog: inclusive two-sided range (src/api.rs:131-138)."""
    return _events_projected(spark, sf_dir).filter(
        F.col("event_id").between(2000, 5000)
    )


@register(
    "logs_keyset_page",
    f"SELECT {_EVENT_PROJ_SQL} FROM events "
    "WHERE ts > TIMESTAMP '2024-01-15 00:00:00' "
    "OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 0) "
    "ORDER BY ts, event_id LIMIT 50",
    tags=("evm-shape", "O-16", "O-17"),
)
def logs_keyset_page(spark, sf_dir):
    """Keyset cursor: row-value (ts, event_id) > (T, 0) spelled out as the
    same OR-of-ranges the reference binds (src/api.rs:162-172)."""
    ev = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cur = (F.col("ts") > t0) | ((F.col("ts") == t0) & (F.col("event_id") > 0))
    return (
        ev.filter(cur)
        .orderBy("ts", "event_id")
        .limit(50)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )


@register(
    "logs_offset_page",
    f"SELECT {_EVENT_PROJ_SQL} FROM events ORDER BY ts, event_id LIMIT 50 OFFSET 200",
    tags=("evm-shape", "O-18"),
)
def logs_offset_page(spark, sf_dir):
    """Legacy OFFSET pagination (src/api.rs:177-182)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id")
        .offset(200)
        .limit(50)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )


@register(
    "point_lookup",
    f"SELECT {_EVENT_PROJ_SQL} FROM events WHERE event_id = 4242",
    tags=("evm-shape", "O-21", "O-22", "O-26"),
)
def point_lookup(spark, sf_dir):
    """Point lookup by key — the /block/{id} & /transaction/{hash} shape
    (src/api.rs:284-321): equality on a unique column, pushed to the scan."""
    return _events_projected(spark, sf_dir).filter(F.col("event_id") == 4242)


@register(
    "top1_latest",
    f"SELECT {_EVENT_PROJ_SQL} FROM events WHERE user_id = 7 "
    "ORDER BY ts DESC, event_id DESC LIMIT 1",
    tags=("evm-shape", "O-25"),
)
def top1_latest(spark, sf_dir):
    """Latest row for a key — the reorg-lookup shape
    (SELECT … ORDER BY … DESC LIMIT 1, src/db.rs:19-30)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 7)
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )


@register(
    "stats_counts",
    "SELECT (SELECT COUNT(*) FROM events) AS events_cnt, "
    "(SELECT COUNT(*) FROM orders) AS orders_cnt, "
    "(SELECT COUNT(*) FROM lineitem) AS lineitem_cnt",
    tags=("evm-shape", "O-23"),
)
def stats_counts(spark, sf_dir):
    """/stats COUNT(*) triple (src/api.rs:243-251).  Three metadata-only
    parquet counts cross-joined into one row — each COUNT compiles to a
    parquet row-group-stats read, no full scan."""
    ev = _t(spark, sf_dir, "events").agg(F.count("*").alias("events_cnt"))
    od = _t(spark, sf_dir, "orders").agg(F.count("*").alias("orders_cnt"))
    li = _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("lineitem_cnt"))
    return ev.crossJoin(od).crossJoin(li)


@register(
    "stats_lag",
    "SELECT MAX(event_id) AS head, COUNT(*) AS processed, "
    "MAX(event_id) + 1 - COUNT(*) AS ingestion_lag FROM events",
    tags=("evm-shape", "O-24"),
)
def stats_lag(spark, sf_dir):
    """Ingestion-lag scalar arithmetic (src/api.rs:253-258 analog)."""
    return _t(spark, sf_dir, "events").agg(
        F.max("event_id").alias("head"),
        F.count("*").alias("processed"),
        (F.max("event_id") + F.lit(1) - F.count("*")).alias("ingestion_lag"),
    )


# =====================================================================
# Relational coverage: joins / aggregation / windows (SURVEY.md §2c —
# capabilities the entity model implies; TPC-H-shaped on driver tables)
# =====================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy grouped aggregation.  Decimal-exact sums
    (order-independent under partial aggregation), final cast to double."""
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10
    """,
    tags=("relational", "join", "topk"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim (customer) broadcast into the fact
    join, grouped revenue, deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("relational", "join", "multiway"),
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; every dimension broadcast (region/nation/
    supplier/customer are tiny even at 100 TB fact scale), one shuffle for
    the final groupBy."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "events_hourly_rollup",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("evm-shape", "agg", "time"),
)
def events_hourly_rollup(spark, sf_dir):
    """Tumbling-window rollup (batch form of X-6): the hypertable-style
    time-bucket aggregation over the event stream."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )
