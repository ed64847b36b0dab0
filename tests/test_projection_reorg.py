"""Projection x deep-reorg interaction property test (VERDICT r4 item 5).

Rollback removes covered base fragments, which makes a clustered
projection stale; nothing before this test drove the full lifecycle:
ingest -> build projection -> deep reorg (depth > BLOCKS_PER_BATCH,
optional crash-restart mid-resolution) -> converge -> maintenance
rebuild -> routing picks the rebuilt projection and its rows equal the
base read exactly.  Two safety properties hold at every step:

- between the reorg and the rebuild the projection NEVER serves silently
  wrong (pre-fork orphaned) rows — read_projection raises loud staleness
  and the query router degrades to the (correct, block-clustered) base;
- after rebuild, projection ≡ base row-for-row and refresh reports
  nothing to fold (covers are current).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.operators import (
    GetLogsFilter,
    get_logs,
    get_logs_from_store,
)
from rust_evm_indexer_spark.sources.rpc import MockRpcClient, TransientRpcError
from rust_evm_indexer_spark.store import TableStore

START = datagen.START_BLOCK
N_BLOCKS = 16


def _make(spark, root, client):
    store = TableStore(spark, root)
    ing = EvmIngester(spark, client, store, start_block=START, backoff_base=0.0)
    return ing, store


def _drive(ing, max_cycles=80):
    for _ in range(max_cycles):
        try:
            if ing.run_cycle().kind == "idle":
                return
        except TransientRpcError:
            continue
    raise AssertionError("did not converge within max_cycles")


scenarios = st.fixed_dictionaries(
    {
        "depth": st.integers(6, 10),  # strictly deeper than BLOCKS_PER_BATCH
        "crash_mid_resolution": st.booleans(),
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
def test_projection_survives_deep_reorg_via_rebuild(spark, sc):
    root = Path(tempfile.mkdtemp(prefix="proj-reorg-")) / "store"
    chain = datagen.generate_chain(n_blocks=N_BLOCKS, seed=47)
    client = MockRpcClient(chain)
    ing, store = _make(spark, root, client)
    _drive(ing)
    store.build_projection(
        "logs", "by_address", ("contract_address",), max_fragments=3
    )
    addr = store.read("logs").select("contract_address").first()[0]

    client.schedule_reorg(depth=sc["depth"], seed=sc["fork_seed"])
    if sc["crash_mid_resolution"]:
        # one walk-back cycle, then a process restart mid-resolution:
        # staleness detection must come entirely from the manifest
        try:
            ing.run_cycle()
        except TransientRpcError:
            pass
        ing, store = _make(spark, root, client)
    _drive(ing)

    # rollback removed covered fragments: loud staleness, never silent
    # orphaned rows
    with pytest.raises(RuntimeError, match="stale"):
        store.read_projection("logs", "by_address", key_equals=addr)
    with pytest.raises(RuntimeError, match="stale"):
        store.refresh_projection("logs", "by_address")

    # the router degrades to the correct base read while stale
    flt = GetLogsFilter(address=addr, page_size=100)
    routed_stale = get_logs_from_store(store, flt)
    assert not any("__proj__" in f for f in routed_stale.inputFiles())
    assert routed_stale.collect() == get_logs(store.read("logs"), flt).collect()

    # maintenance rebuild restores the clustered access path
    store.build_projection(
        "logs", "by_address", ("contract_address",), max_fragments=3
    )
    assert store.refresh_projection("logs", "by_address") == 0  # covers current

    # the rebuilt projection equals the base read exactly — globally and
    # through the router for a per-address probe
    base = store.read("logs")
    via = store.read_projection("logs", "by_address")
    key = ["block_number", "id"]
    assert (
        via.orderBy(*key).collect() == base.orderBy(*key).collect()
        and via.count() == base.count()
    )
    for probe_addr in [
        r[0]
        for r in base.select("contract_address").distinct().limit(3).collect()
    ]:
        pflt = GetLogsFilter(address=probe_addr, page_size=100)
        routed = get_logs_from_store(store, pflt)
        assert any("__proj__" in f for f in routed.inputFiles())
        assert routed.collect() == get_logs(base, pflt).collect()
