"""Explicit StructTypes for every table — schemas are declared, never inferred.

Mirrors the reference DDL (``/root/reference/init.sql:5-74``) with the Spark
type mapping from SURVEY.md §1.4:

- hashes / addresses → StringType, normalized lowercase at ingest (the
  reference writes ``format!("{:#x}")`` lowercase hex — ``src/db.rs:84-89``);
- U256 quantities → StringType for fidelity (PG stored TEXT decimal strings,
  ``src/db.rs:87-89,120-124``) plus derived DecimalType(38,0) compute columns
  added by ``functions.evm.with_u256_decimals`` where arithmetic is needed;
- BYTEA payloads → StringType of the ``0x…`` hex (the reference stores the
  *hex string's* bytes — ``src/main.rs:266,283`` — so the hex string is the
  faithful representation);
- ``logs.id`` BIGSERIAL → deterministic dense rank of
  ``(block_number, transaction_index_in_block, log_index_in_tx)`` assigned at
  ingest; stable across replays and reorg rewrites, unlike
  ``monotonically_increasing_id()`` (SURVEY.md §7 hard-part 1).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference tables ----------------------------------------------------

# init.sql:13-21 — PK block_hash (not height): canonical + uncle blocks can
# coexist at one height during a reorg window.
BLOCKS = T.StructType(
    [
        T.StructField("block_hash", T.StringType(), False),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("parent_hash", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # unix seconds
        T.StructField("gas_used", T.StringType(), False),  # U256 decimal str
        T.StructField("gas_limit", T.StringType(), False),
        T.StructField("base_fee_per_gas", T.StringType(), True),
    ]
)

# init.sql:27-41 — PK tx_hash.
TRANSACTIONS = T.StructType(
    [
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("block_hash", T.StringType(), False),
        T.StructField("transaction_index", T.LongType(), True),
        T.StructField("from_address", T.StringType(), False),
        T.StructField("to_address", T.StringType(), True),  # NULL = creation
        T.StructField("value", T.StringType(), False),  # U256 wei decimal str
        T.StructField("gas_price", T.StringType(), True),
        T.StructField("max_fee_per_gas", T.StringType(), True),
        T.StructField("max_priority_fee_per_gas", T.StringType(), True),
        T.StructField("gas_provided", T.StringType(), False),
        T.StructField("input_data", T.StringType(), True),  # 0x… calldata hex
        T.StructField("status", T.ShortType(), True),  # 1 ok / 0 revert / NULL
    ]
)

# init.sql:49-63 — surrogate id is the cursor tiebreaker (src/api.rs:167-174).
LOGS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("log_index_in_tx", T.LongType(), True),
        T.StructField("transaction_hash", T.StringType(), False),
        T.StructField("transaction_index_in_block", T.LongType(), True),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("block_hash", T.StringType(), False),
        T.StructField("contract_address", T.StringType(), False),
        T.StructField("data", T.StringType(), True),  # 0x… ABI payload hex
        T.StructField("topic0", T.StringType(), True),
        T.StructField("topic1", T.StringType(), True),
        T.StructField("topic2", T.StringType(), True),
        T.StructField("topic3", T.StringType(), True),
        T.StructField("all_topics", T.ArrayType(T.StringType()), True),
    ]
)

# init.sql:5-9 — single-row checkpoint table.
INDEXER_STATUS = T.StructType(
    [
        T.StructField("indexer_name", T.StringType(), False),
        T.StructField("last_processed_block", T.LongType(), True),
        T.StructField("chain_head_at_last_poll", T.LongType(), True),
    ]
)

# engine-maintained continuous aggregate (ingest/rollup.py): per-block
# hourly partials; block_number granularity makes reorg retraction exact.
LOG_ROLLUP = T.StructType(
    [
        T.StructField("block_number", T.LongType(), False),
        T.StructField("hour_ts", T.TimestampType(), False),
        T.StructField("contract_address", T.StringType(), False),
        T.StructField("topic0", T.StringType(), True),
        T.StructField("n_logs", T.LongType(), False),
    ]
)

EVM_SCHEMAS: dict[str, T.StructType] = {
    "blocks": BLOCKS,
    "transactions": TRANSACTIONS,
    "logs": LOGS,
    "indexer_status": INDEXER_STATUS,
    "log_rollup": LOG_ROLLUP,
}

# --- driver-provided generic tables (TESTDATA.md) ------------------------

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
