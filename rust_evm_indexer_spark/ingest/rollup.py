"""Continuous aggregate: an incrementally-maintained hourly log rollup
(the hypertable/TimescaleDB "continuous aggregate" shape, rebuilt on the
delta-store model).

Every ingest batch appends *partial* aggregate rows at
``(block_number, hour_ts, contract_address, topic0)`` granularity to a
``log_rollup`` store table — same atomic manifest swap as the base
tables.  Queries aggregate the partials (cheap: the rollup is orders of
magnitude smaller than ``logs``).  Two properties fall out for free:

- **reorg correctness**: partials carry ``block_number``, so the store's
  ``rollback_from(height)`` retracts exactly the contributions of
  retracted blocks — no recompute, no invalidation bookkeeping;
- **no read-modify-write**: maintenance is append-only (merge happens at
  query time, or during :meth:`TableStore.compact`), so ingest never
  rewrites rollup state and the continuous aggregate scales with batch
  size, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_TABLE = "log_rollup"


def rollup_partials(logs: DataFrame, blocks: DataFrame) -> DataFrame:
    """Per-batch partial aggregates.  ``logs`` lacks a timestamp, so the
    hour comes from a (batch-local, broadcastable) join with ``blocks``."""
    b = blocks.select(
        "block_hash",
        F.date_trunc("hour", F.timestamp_seconds("timestamp")).alias("hour_ts"),
    )
    return (
        logs.join(F.broadcast(b), "block_hash")
        .groupBy("block_number", "hour_ts", "contract_address", "topic0")
        .agg(F.count("*").alias("n_logs"))
    )


def read_rollup(store, *, min_block: int | None = None, max_block: int | None = None) -> DataFrame:
    """The merged continuous aggregate: (hour, contract, topic0) → counts."""
    partials = store.read(ROLLUP_TABLE, min_block=min_block, max_block=max_block)
    return (
        partials.groupBy("hour_ts", "contract_address", "topic0")
        .agg(F.sum("n_logs").alias("n_logs"))
    )
