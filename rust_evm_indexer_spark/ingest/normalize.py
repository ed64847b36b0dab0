"""Normalize/shape transform: raw RPC block batches → relational tables.

The Spark re-expression of the reference's per-block shaping code
(``src/main.rs:191-296``): unwrap options with defaults, extract
``receipt.status``, lowercase every hash/address (≙ ``format!("{:#x}")``,
``src/db.rs:84-89,116-127,161-170``), and fan the nested
block→transactions→receipt→logs structure out into three flat tables.

Where the reference loops row by row in Rust, this is three declarative
``select``/``explode`` plans over ONE nested DataFrame — executors shape
whole batches column-at-a-time under whole-stage codegen, and the same
plan serves 5 blocks (streaming micro-batch) or 5 million (backfill).

Operator coverage: O-5 (normalize/shape), O-6 (topics flattening via
``element_at``), and the join half of O-3 (receipts arrive merged into the
tx struct — a LEFT OUTER tx⟕receipt in dataflow terms; a missing receipt
leaves status/logs NULL exactly like the reference's ``Option<receipt>``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.evm import norm_hex, pack_log_id

# Raw connector batch schema: one row per block, transactions nested, the
# receipt (status + logs) already merged per-tx by the connector fetch.
RAW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("log_index", T.LongType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("data", T.StringType(), True),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
    ]
)

RAW_RECEIPT_SCHEMA = T.StructType(
    [
        T.StructField("transaction_hash", T.StringType(), True),
        T.StructField("status", T.ShortType(), True),
        T.StructField("logs", T.ArrayType(RAW_LOG_SCHEMA), True),
    ]
)

RAW_TX_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("transaction_index", T.LongType(), True),
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("gas_price", T.StringType(), True),
        T.StructField("max_fee_per_gas", T.StringType(), True),
        T.StructField("max_priority_fee_per_gas", T.StringType(), True),
        T.StructField("gas", T.StringType(), True),
        T.StructField("input", T.StringType(), True),
        T.StructField("receipt", RAW_RECEIPT_SCHEMA, True),
    ]
)

RAW_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("number", T.LongType(), False),
        T.StructField("parent_hash", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("gas_used", T.StringType(), True),
        T.StructField("gas_limit", T.StringType(), True),
        T.StructField("base_fee_per_gas", T.StringType(), True),
        T.StructField("transactions", T.ArrayType(RAW_TX_SCHEMA), True),
    ]
)


def explode_batch(
    spark: SparkSession, raw_blocks: list[dict]
) -> dict[str, DataFrame]:
    """One nested batch → ``{"blocks": df, "transactions": df, "logs": df}``.

    Driver-list convenience wrapper over :func:`explode_raw` — the
    streaming micro-batch path (≤ BLOCKS_PER_BATCH rows).  The backfill
    path builds the raw frame executor-side instead (``backfill.py``).
    """
    return explode_raw(spark.createDataFrame(raw_blocks, RAW_BLOCK_SCHEMA))


def explode_raw(raw: DataFrame) -> dict[str, DataFrame]:
    """Nested RAW_BLOCK_SCHEMA frame → the three relational tables."""
    blocks = raw.select(
        norm_hex("hash").alias("block_hash"),
        F.col("number").alias("block_number"),
        norm_hex("parent_hash").alias("parent_hash"),
        F.col("timestamp"),
        F.coalesce("gas_used", F.lit("0")).alias("gas_used"),
        F.coalesce("gas_limit", F.lit("0")).alias("gas_limit"),
        F.col("base_fee_per_gas"),
    )

    tx_flat = raw.select(
        F.col("number").alias("block_number"),
        norm_hex("hash").alias("block_hash"),
        F.explode("transactions").alias("t"),
    )

    transactions = tx_flat.select(
        norm_hex("t.hash").alias("tx_hash"),
        "block_number",
        "block_hash",
        F.col("t.transaction_index").alias("transaction_index"),
        norm_hex("t.from").alias("from_address"),
        norm_hex("t.to").alias("to_address"),
        F.coalesce("t.value", F.lit("0")).alias("value"),
        F.col("t.gas_price").alias("gas_price"),
        F.col("t.max_fee_per_gas").alias("max_fee_per_gas"),
        F.col("t.max_priority_fee_per_gas").alias("max_priority_fee_per_gas"),
        F.coalesce("t.gas", F.lit("0")).alias("gas_provided"),
        F.col("t.input").alias("input_data"),
        F.col("t.receipt.status").alias("status"),  # src/main.rs:250-253
    )

    log_flat = tx_flat.select(
        "block_number",
        "block_hash",
        norm_hex("t.hash").alias("transaction_hash"),
        F.col("t.transaction_index").alias("transaction_index_in_block"),
        F.explode("t.receipt.logs").alias("l"),
    )

    topics = F.col("l.topics")
    logs = log_flat.select(
        pack_log_id(
            F.col("block_number"),
            F.col("transaction_index_in_block"),
            F.col("l.log_index"),
        ).alias("id"),
        F.col("l.log_index").alias("log_index_in_tx"),
        "transaction_hash",
        "transaction_index_in_block",
        "block_number",
        "block_hash",
        norm_hex("l.address").alias("contract_address"),
        F.col("l.data").alias("data"),
        *[
            # O-6; try_element_at: NULL beyond the array end (ANSI-safe),
            # 1-based like PG array indexing
            F.try_element_at(topics, F.lit(i + 1)).alias(f"topic{i}")
            for i in range(4)
        ],
        topics.alias("all_topics"),
    )

    return {"blocks": blocks, "transactions": transactions, "logs": logs}
