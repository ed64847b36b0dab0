"""Store atomicity + ingest semantics: idempotent crash-replay, reorg
retraction, retry/backoff (SURVEY.md §5.4-5.5)."""

from __future__ import annotations

import pytest

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester, explode_batch
from rust_evm_indexer_spark.sources.rpc import MockRpcClient, TransientRpcError
from rust_evm_indexer_spark.store import TableStore

START = datagen.START_BLOCK


def make_ingester(spark, tmp_path, n_blocks=20, head=None, **kw):
    chain = datagen.generate_chain(n_blocks=n_blocks, seed=11)
    client = MockRpcClient(chain, head=head)
    store = TableStore(spark, tmp_path / "store")
    ing = EvmIngester(
        spark, client, store, start_block=START, backoff_base=0.01, **kw
    )
    return ing, client, store


def test_ingest_end_to_end(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path)
    results = ing.run_until_caught_up()
    assert results[-1].kind == "idle"
    assert ing.last_processed() == client.head

    # every canonical block/tx/log landed exactly once
    blocks = store.read("blocks")
    assert blocks.count() == len(client._by_height)
    got_hashes = {r[0] for r in blocks.select("block_hash").collect()}
    assert got_hashes == {b["block_hash"] for b in client._by_height.values()}
    n_txs = sum(len(v) for k, v in client._txs_by_block.items() if k in got_hashes)
    assert store.read("transactions").count() == n_txs
    # checkpoint telemetry consistent (O-24)
    st = store.read_status()
    assert st["last_processed_block"] == client.head


def test_logs_normalized_and_id_ordered(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path)
    ing.run_until_caught_up()
    logs = store.read("logs").orderBy("block_number", "id").collect()
    assert len(logs) == len(client.chain.logs)
    # packed id preserves (block_number, tx_index, log_index) order — the
    # cursor invariant (O-16/O-17)
    key = [
        (r["block_number"], r["transaction_index_in_block"], r["log_index_in_tx"])
        for r in logs
    ]
    assert key == sorted(key)
    ids = [r["id"] for r in logs]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    # topics flattened consistently with the array (O-6)
    for r in logs[:50]:
        tops = r["all_topics"] or []
        for i in range(4):
            want = tops[i] if i < len(tops) else None
            assert r[f"topic{i}"] == want


def test_ingest_batches_capped(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=12)
    res = ing.run_cycle()
    assert res.kind == "ingested"
    assert res.to_block - res.from_block + 1 <= 5  # BLOCKS_PER_BATCH


def test_commit_idempotent_crash_replay(spark, tmp_path):
    """Replaying an already-committed batch is a no-op (O-8: the Delta
    txnAppId/txnVersion pattern ≙ ON CONFLICT DO NOTHING)."""
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=6)
    ing.run_until_caught_up()
    n0 = store.read("transactions").count()
    raw = [client.get_block_with_txs(START + i) for i in range(3)]
    tables = explode_batch(spark, [ing._enrich_receipts(b) for b in raw])
    committed = store.commit(
        tables,
        status=store.read_status(),
        txn_app_id=ing.indexer_name,
        txn_version=START + 2,  # already committed watermark
    )
    assert committed is False
    assert store.read("transactions").count() == n0


def test_reorg_rollback_converges(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=20)
    ing.run_until_caught_up()
    old_tip_hash = client._by_height[client.head]["block_hash"]

    fork = client.schedule_reorg(depth=3)
    results = ing.run_until_caught_up(max_cycles=20)
    assert any(r.kind == "reorg" for r in results)
    assert ing.last_processed() == client.head

    # all orphaned rows retracted from every table (invariant of
    # src/db.rs:34-50); new branch fully present
    blocks = {r[0] for r in store.read("blocks").select("block_hash").collect()}
    assert old_tip_hash not in blocks
    for fb in fork.blocks:
        assert fb["block_hash"] in blocks
    fork_hashes = {b["block_hash"] for b in fork.blocks}
    tx_blocks = {
        r[0] for r in store.read("transactions").select("block_hash").collect()
    }
    assert not (tx_blocks - {b["block_hash"] for b in client.chain.blocks})
    assert fork_hashes <= blocks
    # no duplicate heights survived
    heights = store.read("blocks").groupBy("block_number").count()
    assert heights.filter("count > 1").count() == 0


def test_rollback_prunes_without_full_rewrite(spark, tmp_path):
    """Fragments wholly above the fork are dropped by manifest edit; only
    the straddling fragment is rewritten — rollback cost ∝ fork depth."""
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=20)
    ing.run_until_caught_up()
    before = {
        f.path for f in store.current_manifest().tables["blocks"]
    }
    store.rollback_from(client.head - 1)
    after_frags = store.current_manifest().tables["blocks"]
    # surviving untouched fragments were reused verbatim (no rewrite)
    untouched = [f for f in after_frags if f.path in before]
    assert untouched, "expected untouched fragments below the fork"
    assert store.read("blocks").filter(
        f"block_number >= {client.head - 1}"
    ).count() == 0


def test_retry_recovers_from_transient_failures(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=6)
    client.inject_failures(2)  # first two RPC calls fail; retries absorb
    results = ing.run_until_caught_up()
    assert ing.last_processed() == client.head
    assert results[-1].kind == "idle"


def test_retry_exhaustion_raises(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=6)
    client.inject_failures(50)
    with pytest.raises(TransientRpcError):
        ing.run_cycle()
    # nothing partially committed (src/main.rs:313-329 semantics)
    assert store.read("blocks").count() == 0


def test_vacuum_removes_orphan_fragments(spark, tmp_path):
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=10)
    ing.run_until_caught_up()
    store.rollback_from(client.head - 1)
    removed = store.vacuum()
    assert removed > 0
    # reads still serve the current snapshot
    assert store.read("blocks").count() > 0


def test_compact_preserves_data_and_prunes(spark, tmp_path):
    """Compaction merges fragments atomically; data identical, reads fine,
    vacuum reclaims the old fragments."""
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=20)
    ing.run_until_caught_up()
    before_rows = {
        t: store.read(t).count() for t in ("blocks", "transactions", "logs")
    }
    n_before = store.compact("logs", max_fragments=2)
    assert n_before >= 4  # one fragment per 5-block batch
    assert len(store.current_manifest().tables["logs"]) == 1
    after_rows = {t: store.read(t).count() for t in ("blocks", "transactions", "logs")}
    assert before_rows == after_rows
    # ids still unique & ordered after compaction
    ids = [r[0] for r in store.read("logs").orderBy("block_number", "id").select("id").collect()]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert store.vacuum() > 0
    assert store.read("logs").count() == before_rows["logs"]


def test_concurrent_commit_detected(spark, tmp_path):
    """A second writer racing the same manifest version fails loudly
    (O_EXCL create ≙ conditional-put conflict), never lost-updates."""
    ing, client, store = make_ingester(spark, tmp_path, n_blocks=6)
    ing.run_cycle()
    m = store.current_manifest()
    # simulate a racer that already wrote the next version
    (store.root / "_manifests" / f"v{m.version + 1:06d}.json").write_text("{}")
    with pytest.raises(RuntimeError, match="concurrent commit"):
        store.set_status({"indexer_name": "x", "last_processed_block": 1,
                          "chain_head_at_last_poll": 2})
