"""EVM entity joins parity vs DuckDB over the fixture chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators import joins

from compare import assert_matches_sql


def test_txs_with_block(evm, duck):
    got = joins.txs_with_block(evm["transactions"], evm["blocks"])
    assert_matches_sql(
        got,
        duck,
        """
        SELECT t.*, b.timestamp AS block_timestamp,
               b.base_fee_per_gas AS block_base_fee
        FROM transactions t LEFT JOIN blocks b ON t.block_hash = b.block_hash
        """,
        "txs_with_block",
    )


def test_logs_with_context(evm, duck):
    got = joins.logs_with_context(
        evm["logs"], evm["transactions"], evm["blocks"]
    )
    assert_matches_sql(
        got,
        duck,
        """
        SELECT l.*, t.from_address, t.to_address, t.status AS tx_status,
               b.timestamp AS block_timestamp
        FROM logs l
        LEFT JOIN transactions t ON l.transaction_hash = t.tx_hash
        LEFT JOIN blocks b ON l.block_hash = b.block_hash
        """,
        "logs_with_context",
    )


def test_address_activity(evm, duck):
    got = joins.address_activity(evm["transactions"]).select(
        "address",
        "n_sent",
        "n_recv",
        # decimal(38,0) → string for engine-neutral comparison vs HUGEINT
        F.col("wei_sent").cast("string").alias("wei_sent"),
        F.col("wei_recv").cast("string").alias("wei_recv"),
    )
    assert_matches_sql(
        got,
        duck,
        """
        WITH u AS (
          SELECT from_address AS address, 1 AS n_sent, 0 AS n_recv,
                 CAST(value AS HUGEINT) AS wei_sent, 0 AS wei_recv
          FROM transactions
          UNION ALL
          SELECT to_address, 0, 1, 0, CAST(value AS HUGEINT)
          FROM transactions WHERE to_address IS NOT NULL)
        SELECT address, CAST(SUM(n_sent) AS BIGINT) AS n_sent,
               CAST(SUM(n_recv) AS BIGINT) AS n_recv,
               CAST(SUM(wei_sent) AS VARCHAR) AS wei_sent,
               CAST(SUM(wei_recv) AS VARCHAR) AS wei_recv
        FROM u GROUP BY address
        """,
        "address_activity",
    )


def test_block_activity(evm, duck):
    got = joins.block_activity(
        evm["blocks"], evm["transactions"], evm["logs"]
    )
    assert_matches_sql(
        got,
        duck,
        """
        SELECT b.block_hash, b.block_number, b.timestamp,
               COALESCE(t.n_txs, 0) AS n_txs, COALESCE(t.n_ok, 0) AS n_ok,
               COALESCE(l.n_logs, 0) AS n_logs
        FROM blocks b
        LEFT JOIN (SELECT block_hash, COUNT(*) AS n_txs,
                          CAST(SUM(CASE WHEN status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
                   FROM transactions GROUP BY 1) t USING (block_hash)
        LEFT JOIN (SELECT block_hash, COUNT(*) AS n_logs
                   FROM logs GROUP BY 1) l USING (block_hash)
        """,
        "block_activity",
    )
