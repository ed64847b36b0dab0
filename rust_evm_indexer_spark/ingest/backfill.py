"""Executor-parallel historical backfill.

The reference syncs history 5 blocks per 10 s cycle (``src/main.rs:25``)
— fine for tip-following, hopeless for a 20M-block history.  The Spark
shape: distribute the block range across executors, fetch + enrich
*partition-parallel* through the chain client, and land everything in one
atomic store commit:

    spark.range(start, end+1)            # block numbers, no data motion
      .repartition(fetch_partitions)     # fan out across executors
      .mapInPandas(fetch_kernel)         # RPC fan-out per partition
      → from_json(RAW_BLOCK_SCHEMA)      # JVM-side parse to nested rows
      → explode_raw(...)                 # the same normalize plan as
                                         # streaming ingest
      → store.commit(...)                # one manifest swap

The connector crosses the Python boundary as a JSON string column —
Arrow-batched both ways, parsed by Spark's ``from_json`` (codegen), so
the slow path is exactly the network I/O and nothing else.  Receipt
enrichment happens inside the kernel with the same bounded thread pool
as the streaming path (O-3/O-4 semantics per partition).

Each executor retries transient RPC failures (exponential backoff);
Spark task retries are the backstop, and the store's idempotent commit
makes a re-run of the whole backfill a no-op.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..store import TableStore
from .normalize import RAW_BLOCK_SCHEMA, explode_raw


def _make_fetch_kernel(client, max_receipt_concurrent: int, retries: int, backoff: float):
    """Build the per-partition fetch kernel (client is pickled to
    executors; a production client opens its HTTP session lazily)."""

    def with_retry(fn, *args):
        last: Exception | None = None
        for attempt in range(1, retries + 1):
            try:
                return fn(*args)
            except Exception as exc:  # noqa: BLE001 — connector boundary
                last = exc
                if attempt < retries:
                    time.sleep(backoff * 2 ** (attempt - 1))
        raise last

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            out: list[str] = []
            numbers: list[int] = []
            for n in pdf["id"]:
                raw = with_retry(client.get_block_with_txs, int(n))
                if raw is None:
                    continue
                txs = raw.get("transactions") or []
                with ThreadPoolExecutor(max_workers=max_receipt_concurrent) as pool:
                    receipts = list(
                        pool.map(
                            lambda t: with_retry(
                                client.get_transaction_receipt, t["hash"]
                            ),
                            txs,
                        )
                    )
                raw = {
                    **raw,
                    "transactions": [
                        {**t, "receipt": r} for t, r in zip(txs, receipts)
                    ],
                }
                numbers.append(int(n))
                out.append(json.dumps(raw))
            yield pd.DataFrame({"number": numbers, "raw_json": out})

    return kernel


def fetch_range(
    spark: SparkSession,
    client,
    start_block: int,
    end_block: int,
    *,
    fetch_partitions: int = 8,
    max_receipt_concurrent: int = 10,
    retries: int = 3,
    backoff: float = 0.05,
) -> DataFrame:
    """Raw nested frame for [start_block, end_block], fetched
    executor-parallel.  Lazy: nothing is fetched until an action runs."""
    from ..util import ensure_package_shipped

    ensure_package_shipped(spark)
    kernel = _make_fetch_kernel(client, max_receipt_concurrent, retries, backoff)
    fetched = (
        spark.range(start_block, end_block + 1)
        .repartition(fetch_partitions)
        .mapInPandas(kernel, schema="number long, raw_json string")
    )
    return fetched.select(
        F.from_json("raw_json", RAW_BLOCK_SCHEMA).alias("b")
    ).select("b.*")


def backfill(
    spark: SparkSession,
    client,
    store: TableStore,
    start_block: int,
    end_block: int,
    *,
    indexer_name: str = "evm_backfill",
    fetch_partitions: int = 8,
    **fetch_kw,
) -> dict[str, int]:
    """Fetch + normalize + commit a block range atomically.  Returns row
    counts per table.  Idempotent: txn watermark = end_block.

    The raw frame is persisted and materialized ONCE before the 4-table
    fan-out: ``store.commit`` runs one Spark action per table, and
    without the pin each action would re-run the RPC fetch kernel (4-5×
    the network cost — and, against a live chain, each table could
    materialize from a *different* chain snapshot, silently breaking the
    cross-table consistency the single manifest swap guarantees)."""
    from pyspark.storagelevel import StorageLevel

    raw = fetch_range(
        spark,
        client,
        start_block,
        end_block,
        fetch_partitions=fetch_partitions,
        **fetch_kw,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        raw.count()  # force the single materialized fetch
        tables = explode_raw(raw)
        from .rollup import ROLLUP_TABLE, rollup_partials

        tables[ROLLUP_TABLE] = rollup_partials(tables["logs"], tables["blocks"])
        committed = store.commit(
            tables,
            status={
                "indexer_name": indexer_name,
                "last_processed_block": end_block,
                "chain_head_at_last_poll": end_block,
            },
            txn_app_id=indexer_name,
            txn_version=end_block,
        )
        if not committed:
            return {t: 0 for t in tables}
        return {t: store.table_rows(t) for t in tables}
    finally:
        raw.unpersist()
