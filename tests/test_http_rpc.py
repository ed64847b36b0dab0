"""HTTP JSON-RPC client path (the live-chain connector the reference
uses via an ethers provider): wire-format translation parity with the
mock, retry-through-HTTP-errors, and driver + executor-side ingestion
over real HTTP."""

from __future__ import annotations

import pytest
import urllib.error

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.ingest.backfill import backfill
from rust_evm_indexer_spark.sources.rpc import MockRpcClient
from rust_evm_indexer_spark.sources.rpc_http import HttpRpcClient
from rust_evm_indexer_spark.store import TableStore

from jsonrpc_server import JsonRpcChainServer


@pytest.fixture(scope="module")
def chain():
    return datagen.generate_chain(n_blocks=12, seed=5)


def test_wire_translation_matches_mock(chain):
    """HttpRpcClient(wire(mock)) must be the IDENTITY on the connector
    dict shape — hex/camelCase round-trips exactly, including None
    fields (pre-London baseFeePerGas, pre-Byzantium status, creations)."""
    mock = MockRpcClient(chain)
    with JsonRpcChainServer(mock) as srv:
        http = HttpRpcClient(srv.url)
        assert http.get_block_number() == mock.get_block_number()
        for n in range(datagen.START_BLOCK, datagen.START_BLOCK + 12):
            assert http.get_block_with_txs(n) == mock.get_block_with_txs(n)
        for t in chain.transactions:
            assert http.get_transaction_receipt(
                t["tx_hash"]
            ) == mock.get_transaction_receipt(t["tx_hash"])
        # past the head → null result → None
        assert http.get_block_with_txs(datagen.START_BLOCK + 999) is None


def test_http_errors_raise_and_retry_recovers(spark, tmp_path, chain):
    """HTTP 503s raise (urllib.error) and the ingester's O-4 retry
    absorbs them — same semantics as the mock's TransientRpcError."""
    mock = MockRpcClient(chain)
    with JsonRpcChainServer(mock) as srv:
        http = HttpRpcClient(srv.url)
        srv.fail_budget = 1
        with pytest.raises(urllib.error.HTTPError):
            http.get_block_number()
        srv.fail_budget = 2
        ing = EvmIngester(
            spark,
            http,
            TableStore(spark, tmp_path / "retry_store"),
            start_block=datagen.START_BLOCK,
            backoff_base=0.01,
        )
        assert ing._with_retry(http.get_block_number) == mock.get_block_number()


def test_ingest_over_http_equals_mock(spark, tmp_path, chain):
    """Full ingestion driven through real HTTP lands the same rows as
    the in-memory mock path."""
    with JsonRpcChainServer(MockRpcClient(chain)) as srv:
        store_h = TableStore(spark, tmp_path / "http_store")
        EvmIngester(
            spark,
            HttpRpcClient(srv.url),
            store_h,
            start_block=datagen.START_BLOCK,
            backoff_base=0.01,
        ).run_until_caught_up()
    store_m = TableStore(spark, tmp_path / "mock_store")
    EvmIngester(
        spark,
        MockRpcClient(chain),
        store_m,
        start_block=datagen.START_BLOCK,
        backoff_base=0.01,
    ).run_until_caught_up()
    for table in ("blocks", "transactions", "logs"):
        a = sorted(map(tuple, store_h.read(table).collect()))
        b = sorted(map(tuple, store_m.read(table).collect()))
        assert a == b, f"{table} differs between HTTP and mock ingest"


def test_backfill_over_http(spark, tmp_path, chain):
    """The pickled client fetches from EXECUTORS over HTTP inside the
    mapInPandas kernel (the 100 TB backfill path)."""
    with JsonRpcChainServer(MockRpcClient(chain)) as srv:
        store = TableStore(spark, tmp_path / "bf_http")
        counts = backfill(
            spark,
            HttpRpcClient(srv.url),
            store,
            datagen.START_BLOCK,
            datagen.START_BLOCK + 11,
            fetch_partitions=4,
            backoff=0.01,
        )
    assert counts["blocks"] == 12
    assert counts["logs"] == len(chain.logs)
    assert counts["transactions"] == len(chain.transactions)
