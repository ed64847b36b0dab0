"""Continuous aggregate: the incrementally-maintained hourly rollup must
always equal a direct aggregation of the base table — including through
reorgs (retraction of partials) and compaction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.ingest.rollup import ROLLUP_TABLE, read_rollup
from rust_evm_indexer_spark.sources.rpc import MockRpcClient
from rust_evm_indexer_spark.store import TableStore


def direct_agg(store):
    b = store.read("blocks").select(
        "block_hash",
        F.date_trunc("hour", F.timestamp_seconds("timestamp")).alias("hour_ts"),
    )
    return {
        (r["hour_ts"], r["contract_address"], r["topic0"]): r["n"]
        for r in store.read("logs")
        .join(b, "block_hash")
        .groupBy("hour_ts", "contract_address", "topic0")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def rollup_agg(store):
    return {
        (r["hour_ts"], r["contract_address"], r["topic0"]): r["n_logs"]
        for r in read_rollup(store).collect()
    }


def test_rollup_matches_direct_agg(spark, tmp_path):
    chain = datagen.generate_chain(n_blocks=20, seed=31)
    client = MockRpcClient(chain)
    store = TableStore(spark, tmp_path / "ro")
    ing = EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.01
    )
    ing.run_until_caught_up()
    assert rollup_agg(store) == direct_agg(store)
    # incremental: every ingest batch contributed its own partial fragment
    assert len(store.current_manifest().tables[ROLLUP_TABLE]) >= 3


@pytest.mark.slow
def test_rollup_survives_reorg_and_compaction(spark, tmp_path):
    chain = datagen.generate_chain(n_blocks=20, seed=32)
    client = MockRpcClient(chain)
    store = TableStore(spark, tmp_path / "ro2")
    ing = EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.01
    )
    ing.run_until_caught_up()
    client.schedule_reorg(depth=3)
    ing.run_until_caught_up(max_cycles=20)
    # retraction dropped exactly the orphaned blocks' partials
    assert rollup_agg(store) == direct_agg(store)
    store.compact(ROLLUP_TABLE, max_fragments=1)
    assert rollup_agg(store) == direct_agg(store)
