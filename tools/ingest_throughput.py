"""Measured ingest throughput for the BASELINE.md integrity/throughput
claim ("10M+ transactions ingested"; "processing pipeline not the
bottleneck" — README.md:41,238).

The reference's published bound is the RPC side; this measures OUR
processing pipeline with the RPC cost at mock-client floor, so the
number is the pipeline ceiling: executor-parallel fetch → from_json →
normalize/explode → rollup partials → atomic 4-table manifest commit.

Two shapes:
- tip-following cycle (5-block batches, the reference's cadence):
  per-cycle latency must sit far under the 10 s poll interval;
- historical backfill (`ingest/backfill.py`): blocks/s and rows/s for a
  2,000-block range on local[$SPARK_GRAFT_CPUS].

Prints one JSON line; also written to ``.soak_cache/ingest_throughput.json``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rust_evm_indexer_spark import datagen  # noqa: E402
from rust_evm_indexer_spark.ingest import EvmIngester  # noqa: E402
from rust_evm_indexer_spark.ingest.backfill import backfill  # noqa: E402
from rust_evm_indexer_spark.session import get_spark  # noqa: E402
from rust_evm_indexer_spark.sources.rpc import MockRpcClient  # noqa: E402
from rust_evm_indexer_spark.store import TableStore  # noqa: E402

N_BLOCKS = 2000


def main() -> None:
    import shutil
    import tempfile

    spark = get_spark("ingest-throughput")
    work = Path(tempfile.mkdtemp(prefix="ingest-tp-"))
    chain = datagen.generate_chain(n_blocks=N_BLOCKS, seed=5)
    n_txs = len(chain.transactions)
    n_logs = len(chain.logs)

    # -- tip-following cycles (5-block batches, reference cadence) -----
    client = MockRpcClient(chain, head=datagen.START_BLOCK + 49)
    store = TableStore(spark, work / "tip_store")
    ing = EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.01
    )
    ing.run_until_caught_up(max_cycles=3)  # warm the commit path
    t0 = time.perf_counter()
    cycles = ing.run_until_caught_up(max_cycles=20)
    tip_wall = time.perf_counter() - t0
    n_cycles = sum(1 for c in cycles if c.kind == "ingested")
    per_cycle = tip_wall / max(1, n_cycles)

    # -- historical backfill -------------------------------------------
    client2 = MockRpcClient(chain)
    store2 = TableStore(spark, work / "bf_store")
    t0 = time.perf_counter()
    rows = backfill(
        spark,
        client2,
        store2,
        datagen.START_BLOCK,
        datagen.START_BLOCK + N_BLOCKS - 1,
        fetch_partitions=32,
    )
    bf_wall = time.perf_counter() - t0

    result = {
        "metric": "ingest_throughput",
        "tip_cycle_sec": round(per_cycle, 3),
        "tip_cycles_measured": n_cycles,
        "poll_interval_sec": 10.0,
        "backfill_blocks": N_BLOCKS,
        "backfill_wall_sec": round(bf_wall, 2),
        "backfill_blocks_per_sec": round(N_BLOCKS / bf_wall, 1),
        "backfill_rows_per_sec": round((N_BLOCKS + n_txs + n_logs) / bf_wall, 1),
        "chain_txs": n_txs,
        "chain_logs": n_logs,
        "committed_rows": rows,
    }
    out = Path(__file__).resolve().parents[1] / ".soak_cache"
    out.mkdir(exist_ok=True)
    (out / "ingest_throughput.json").write_text(json.dumps(result, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
