"""Deep-reorg property test (VERDICT r3 item 7): random fork depths
GREATER than BLOCKS_PER_BATCH, with crash injection between cycles
(process restart ≙ fresh ingester+store over the same manifest root, and
aborted batches via injected transient RPC failures).  Invariant: after
convergence the store holds EXACTLY the canonical chain across all three
tables — no orphaned rows survive, nothing is lost, nothing duplicated —
and the incrementally-maintained rollup equals a direct re-aggregation.

The reference resolves deep reorgs the same way (one parent-step of
walk-back per poll cycle, src/main.rs:166-189); depth > batch size is
exactly the regime where walk-back and re-ingest interleave across many
cycles, so checkpoint/rollback bookkeeping bugs surface here.
"""

from __future__ import annotations

import pytest

import tempfile
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.sources.rpc import MockRpcClient, TransientRpcError
from rust_evm_indexer_spark.store import TableStore

START = datagen.START_BLOCK
N_BLOCKS = 18


def _make(spark, root, client):
    store = TableStore(spark, root)
    ing = EvmIngester(
        spark, client, store, start_block=START, backoff_base=0.0
    )
    return ing, store


def _drive(ing, max_cycles=80):
    """run_until_caught_up that treats retry exhaustion as a crash: the
    batch aborted pre-commit; the next cycle resumes from the checkpoint."""
    for _ in range(max_cycles):
        try:
            if ing.run_cycle().kind == "idle":
                return
        except TransientRpcError:
            continue
    raise AssertionError("did not converge within max_cycles")


def _assert_store_is_canonical(store, client):
    canon_blocks = {b["block_hash"] for b in client._by_height.values()}
    got_blocks = {
        r[0] for r in store.read("blocks").select("block_hash").collect()
    }
    assert got_blocks == canon_blocks

    canon_txs = {
        t["tx_hash"]
        for t in client.chain.transactions
        if t["block_hash"] in canon_blocks
    }
    got_txs = {
        r[0] for r in store.read("transactions").select("tx_hash").collect()
    }
    assert got_txs == canon_txs

    canon_logs = {
        (lg["transaction_hash"], lg["log_index_in_tx"])
        for lg in client.chain.logs
        if lg["block_hash"] in canon_blocks
    }
    got_logs = {
        (r[0], r[1])
        for r in store.read("logs")
        .select("transaction_hash", "log_index_in_tx")
        .collect()
    }
    assert got_logs == canon_logs

    # uniqueness invariants: one block per height, one row per log id
    heights = store.read("blocks").groupBy("block_number").count()
    assert heights.filter("count > 1").count() == 0
    ids = store.read("logs").groupBy("id").count()
    assert ids.filter("count > 1").count() == 0


def _assert_rollup_consistent(spark, store):
    """The per-batch rollup partials, net of reorg retraction, must equal
    re-aggregating the converged base tables (the catalog entry's check,
    replayed post-property-scenario)."""
    from pyspark.sql import functions as F

    from rust_evm_indexer_spark.ingest.rollup import read_rollup

    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = {
            (r["hour_ts"], r["contract_address"], r["topic0"]): r["n_logs"]
            for r in read_rollup(store).collect()
        }
        want = {
            (r["hour_ts"], r["contract_address"], r["topic0"]): r["n"]
            for r in store.read("logs")
            .join(
                store.read("blocks").select("block_hash", "timestamp"),
                "block_hash",
            )
            .groupBy(
                # blocks.timestamp is epoch seconds (BIGINT) — same
                # bucketing as rollup_partials
                F.date_trunc(
                    "hour", F.timestamp_seconds(F.col("timestamp"))
                ).alias("hour_ts"),
                "contract_address",
                "topic0",
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


scenarios = st.fixed_dictionaries(
    {
        # both forks strictly deeper than BLOCKS_PER_BATCH (5)
        "depth1": st.integers(6, 10),
        "depth2": st.integers(0, 8),  # <6 ⇒ no second fork
        "crash_after_fork": st.booleans(),
        "fail_mid_ingest": st.booleans(),
        "fork_seed": st.integers(1, 10_000),
    }
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(sc=scenarios)
def test_deep_reorg_converges_to_canonical_chain(spark, sc):
    root = Path(tempfile.mkdtemp(prefix="deep-reorg-")) / "store"
    chain = datagen.generate_chain(n_blocks=N_BLOCKS, seed=31)
    client = MockRpcClient(chain)
    ing, store = _make(spark, root, client)
    _drive(ing)

    client.schedule_reorg(depth=sc["depth1"], seed=sc["fork_seed"])
    if sc["fail_mid_ingest"]:
        # exhaust the 3 retries: the in-flight batch aborts pre-commit
        client.inject_failures(8)
    if sc["crash_after_fork"]:
        # process restart: all state must come back from the manifest
        ing, store = _make(spark, root, client)
    _drive(ing)
    _assert_store_is_canonical(store, client)

    if sc["depth2"] >= 6:
        client.schedule_reorg(depth=sc["depth2"], seed=sc["fork_seed"] + 1)
        # always restart after the second fork: deep-reorg walk-back must
        # survive losing every bit of in-process state mid-resolution
        ing, store = _make(spark, root, client)
        _drive(ing)
        _assert_store_is_canonical(store, client)

    _assert_rollup_consistent(spark, store)
