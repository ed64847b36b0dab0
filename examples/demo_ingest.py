"""End-to-end demo: ingest a mock EVM chain into the atomic table store,
serve the reference's API queries over it, survive a 3-block reorg.

Run: python examples/demo_ingest.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.operators import GetLogsFilter, get_logs, run_get_logs
from rust_evm_indexer_spark.operators.lookups import get_block, get_stats
from rust_evm_indexer_spark.session import get_spark
from rust_evm_indexer_spark.sources.rpc import MockRpcClient
from rust_evm_indexer_spark.store import TableStore


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="evmdemo-")
    spark = get_spark("demo_ingest", cpus=8, shuffle_partitions=8)

    chain = datagen.generate_chain(n_blocks=30, seed=99)
    client = MockRpcClient(chain)
    store = TableStore(spark, Path(workdir) / "store")
    ingester = EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.05
    )

    print(f"== ingesting to head {client.head} ==")
    for res in ingester.run_until_caught_up():
        print(f"  cycle: {res.kind} {res.from_block}..{res.to_block}")

    stats = get_stats(
        store.read("blocks"),
        store.read("transactions"),
        store.read("logs"),
        spark.createDataFrame(
            [store.read_status()], "indexer_name string, last_processed_block long, "
            "chain_head_at_last_poll long"
        ),
    )
    print(f"stats: {stats}")

    page = run_get_logs(
        store.read("logs"), GetLogsFilter(topic0=datagen.TRANSFER_SIG, page_size=5)
    )
    print(f"transfer logs page-1 ids: {[r['id'] for r in page.logs]}")
    page2 = run_get_logs(
        store.read("logs"),
        GetLogsFilter(
            topic0=datagen.TRANSFER_SIG,
            page_size=5,
            cursor_block=page.next_cursor_block,
            cursor_log_id=page.next_cursor_log_id,
        ),
    )
    print(f"transfer logs page-2 ids: {[r['id'] for r in page2.logs]}")
    assert not {r["id"] for r in page.logs} & {r["id"] for r in page2.logs}

    blk = get_block(store.read("blocks"), str(datagen.START_BLOCK + 3))
    print(f"block {blk['block_number']}: {blk['block_hash'][:18]}…")

    print("== 3-block reorg ==")
    old_tip = client._by_height[client.head]["block_hash"]
    client.schedule_reorg(depth=3)
    for res in ingester.run_until_caught_up(max_cycles=20):
        print(f"  cycle: {res.kind} rollback_from={res.rollback_from} "
              f"{res.from_block}..{res.to_block}")
    blocks = {r[0] for r in store.read("blocks").select("block_hash").collect()}
    assert old_tip not in blocks, "orphaned tip survived the reorg!"
    assert ingester.last_processed() == client.head
    print(f"reorg converged: head={client.head}, orphan retracted, "
          f"blocks={store.table_rows('blocks')}")

    print("== background maintenance ==")
    # per-batch ingest + reorg rewrites leave many small fragments; the
    # stats()-driven policy pass closes the loop a production deployment
    # runs on a timer — and queries must be answer-identical across it
    from rust_evm_indexer_spark.store import MaintenancePolicy

    before = {r["id"] for r in get_logs(
        store.read("logs"),
        GetLogsFilter(topic0=datagen.TRANSFER_SIG, page_size=100),
    ).collect()}
    rep = store.maintain_store(MaintenancePolicy(max_fragments=4))
    st = store.stats()["tables"]
    print(f"maintain: triggers={rep['triggers']} vacuumed={rep['vacuumed']}; "
          f"fragments now " +
          ", ".join(f"{t}={v['fragments']}" for t, v in sorted(st.items())))
    after = {r["id"] for r in get_logs(
        store.read("logs"),
        GetLogsFilter(topic0=datagen.TRANSFER_SIG, page_size=100),
    ).collect()}
    assert after == before, "maintenance changed query answers!"
    assert all(v["fragments"] <= 4 for v in st.values())

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
