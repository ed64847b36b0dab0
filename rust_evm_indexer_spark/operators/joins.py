"""Entity joins over the EVM model (SURVEY.md §2c).

The reference's API is single-table per endpoint, but its schema implies
the block 1→N transaction 1→N log hierarchy (implicit FKs,
``init.sql:27-41,49-63``) — an analytics engine over the same data must
expose the joins.  Join strategy is chosen for the 100 TB shape:

- ``blocks`` is tiny relative to ``logs``/``transactions`` (1:N with
  N ≈ hundreds) → broadcast it, never shuffle the fact side;
- ``transactions ⋈ logs`` is fact-to-fact → sort-merge on ``tx_hash``;
  at rest, writing both tables bucketed by the join key removes even that
  shuffle.  Joining on ``block_number`` equality first lets AQE skew-join
  handle hot blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.evm import u256_to_decimal


def txs_with_block(transactions: DataFrame, blocks: DataFrame) -> DataFrame:
    """transactions ⟕ blocks: each tx with its block header (broadcast)."""
    b = blocks.select(
        "block_hash",
        F.col("timestamp").alias("block_timestamp"),
        F.col("base_fee_per_gas").alias("block_base_fee"),
    )
    return transactions.join(F.broadcast(b), "block_hash", "left")


def logs_with_context(
    logs: DataFrame, transactions: DataFrame, blocks: DataFrame
) -> DataFrame:
    """logs ⋈ transactions ⋈ blocks — the full denormalized event view.

    tx side pruned to the joined columns *before* the join (column pruning
    is free, but being explicit keeps the shuffled payload minimal)."""
    t = transactions.select(
        F.col("tx_hash"),
        F.col("from_address"),
        F.col("to_address"),
        F.col("status").alias("tx_status"),
    )
    b = blocks.select(
        "block_hash", F.col("timestamp").alias("block_timestamp")
    )
    return (
        logs.join(t, logs.transaction_hash == t.tx_hash, "left")
        .join(F.broadcast(b), "block_hash", "left")
        .drop("tx_hash")
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist a table BUCKETED by its join key (Spark bucketing:
    hash(key) % n_buckets decides the file, recorded in the catalog).

    This is the at-rest layout SCALE.md promises for the fact⋈fact
    ``transactions ⋈ logs`` join: when both sides are bucketed on the
    join key with the same bucket count, the join is co-located — the
    planner emits NO Exchange (and with ``sortBy``, no Sort either), so
    the only cluster-wide data movement for a 100 TB join is reading
    each bucket pair.  Asserted in
    ``test_plan_hygiene.py::test_bucketed_tx_log_join_no_shuffle``."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table_name)


def colocated_logs_with_txs(spark, logs_table: str, txs_table: str) -> DataFrame:
    """logs ⋈ transactions from bucketed tables — shuffle-free."""
    lg = spark.table(logs_table)
    t = spark.table(txs_table).select(
        F.col("tx_hash"),
        "from_address",
        "to_address",
        F.col("status").alias("tx_status"),
    )
    return lg.join(t, lg.transaction_hash == t.tx_hash, "left").drop("tx_hash")


def address_activity(transactions: DataFrame) -> DataFrame:
    """Per-address activity rollup: sent/received counts + wei totals.
    The from/to union is a single unpivot (no double scan after Catalyst
    caches the projection), aggregated in one shuffle."""
    sent = transactions.select(
        F.col("from_address").alias("address"),
        F.lit(1).alias("n_sent"),
        F.lit(0).alias("n_recv"),
        u256_to_decimal("value").alias("wei_sent"),
        F.lit(0).cast("decimal(38,0)").alias("wei_recv"),
    )
    recv = transactions.where(F.col("to_address").isNotNull()).select(
        F.col("to_address").alias("address"),
        F.lit(0).alias("n_sent"),
        F.lit(1).alias("n_recv"),
        F.lit(0).cast("decimal(38,0)").alias("wei_sent"),
        u256_to_decimal("value").alias("wei_recv"),
    )
    return (
        sent.unionByName(recv)
        .groupBy("address")
        .agg(
            F.sum("n_sent").alias("n_sent"),
            F.sum("n_recv").alias("n_recv"),
            F.sum("wei_sent").cast("decimal(38,0)").alias("wei_sent"),
            F.sum("wei_recv").cast("decimal(38,0)").alias("wei_recv"),
        )
    )


def block_activity(
    blocks: DataFrame, transactions: DataFrame, logs: DataFrame
) -> DataFrame:
    """Per-block rollup: tx count, log count, success rate — partial
    aggregates computed per child table THEN joined (aggregate-then-join:
    shuffles carry one row per block, not one per tx/log)."""
    tx_agg = transactions.groupBy("block_hash").agg(
        F.count("*").alias("n_txs"),
        F.sum(F.when(F.col("status") == 1, 1).otherwise(0)).alias("n_ok"),
    )
    log_agg = logs.groupBy("block_hash").agg(F.count("*").alias("n_logs"))
    return (
        blocks.select("block_hash", "block_number", "timestamp")
        .join(tx_agg, "block_hash", "left")
        .join(log_agg, "block_hash", "left")
        .select(
            "block_hash",
            "block_number",
            "timestamp",
            F.coalesce("n_txs", F.lit(0)).alias("n_txs"),
            F.coalesce("n_ok", F.lit(0)).alias("n_ok"),
            F.coalesce("n_logs", F.lit(0)).alias("n_logs"),
        )
    )
