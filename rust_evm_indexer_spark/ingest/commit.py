"""Micro-batch ingest orchestration: poll → fetch → reorg-check →
normalize → atomic commit.

The batch re-expression of the reference's ingestion loop
(``src/main.rs:71-337``), one method per operator:

- O-1/O-2  head discovery + bounded range scan (``BLOCKS_PER_BATCH``);
- O-3      per-tx receipt enrichment, concurrency-bounded fan-out
           (ThreadPool(10) ≙ ``buffer_unordered(10)``) — connector I/O,
           like the reference's; at backfill scale the same fetch runs
           partition-parallel on executors (see streaming module);
- O-4      retry with exponential backoff (3 attempts, base 2s defaults);
- O-5/O-6  normalize + explode (``normalize.explode_batch``);
- O-7..O-9 atomic cross-table commit with the checkpoint *inside* the
           same manifest swap, idempotent on (app_id, last_block);
- O-10/O-11 parent-hash reorg detection → rollback_from(fork height).

Failure semantics mirror the reference (``src/main.rs:313-329``): any
error aborts the whole batch before the manifest swap, so the store never
holds a partial block; the next cycle retries from the checkpoint.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..datagen import INDEXER_NAME
from ..store import TableStore
from .normalize import explode_batch

# operating parameters, values per src/main.rs:24-29
POLL_INTERVAL_SECONDS = 10.0
BLOCKS_PER_BATCH = 5
MAX_RECEIPT_CONCURRENT = 10
FETCH_RETRIES = 3
BACKOFF_BASE_SECONDS = 2.0


@dataclass
class CycleResult:
    kind: str  # "idle" | "ingested" | "reorg"
    from_block: int | None = None
    to_block: int | None = None
    rollback_from: int | None = None
    maintained: dict | None = None  # per-table maintain() reports, if run


class EvmIngester:
    def __init__(
        self,
        spark: SparkSession,
        client,
        store: TableStore,
        *,
        start_block: int,
        indexer_name: str = INDEXER_NAME,
        blocks_per_batch: int = BLOCKS_PER_BATCH,
        max_receipt_concurrent: int = MAX_RECEIPT_CONCURRENT,
        retries: int = FETCH_RETRIES,
        backoff_base: float = BACKOFF_BASE_SECONDS,
        maintain_every_cycles: int | None = None,
        maintain_max_fragments: int = 8,
    ):
        self.spark = spark
        self.client = client
        self.store = store
        self.start_block = start_block
        self.indexer_name = indexer_name
        self.blocks_per_batch = blocks_per_batch
        self.max_receipt_concurrent = max_receipt_concurrent
        self.retries = retries
        self.backoff_base = backoff_base
        #: scheduled store maintenance: every N ingesting cycles, run
        #: TableStore.maintain() on each EVM table — streaming ingest
        #: writes one fragment per batch, and without compaction small
        #: queries pay scan cost ∝ fragment count.  None = caller owns
        #: maintenance (the production default at scale is a separate
        #: background job; in-loop scheduling suits single-process
        #: deployments, the reference's own shape).
        self.maintain_every_cycles = maintain_every_cycles
        self.maintain_max_fragments = maintain_max_fragments
        self._cycles_since_maintain = 0

    # -- O-4: retry with exponential backoff (src/main.rs:32-62) ----------

    def _with_retry(self, fn, *args):
        last_exc: Exception | None = None
        for attempt in range(1, self.retries + 1):
            try:
                return fn(*args)
            except Exception as exc:  # noqa: BLE001 — connector boundary
                last_exc = exc
                if attempt < self.retries:
                    time.sleep(self.backoff_base * 2 ** (attempt - 1))
        raise last_exc

    # -- O-3: concurrent receipt fan-out (src/main.rs:204-227) ------------

    def _enrich_receipts(self, raw_block: dict) -> dict:
        txs = raw_block.get("transactions") or []
        with ThreadPoolExecutor(max_workers=self.max_receipt_concurrent) as pool:
            receipts = list(
                pool.map(
                    lambda t: self._with_retry(
                        self.client.get_transaction_receipt, t["hash"]
                    ),
                    txs,
                )
            )
        # LEFT OUTER: a missing receipt leaves status/logs NULL
        return {
            **raw_block,
            "transactions": [
                {**t, "receipt": r} for t, r in zip(txs, receipts)
            ],
        }

    # -- checkpoint helpers ------------------------------------------------

    def last_processed(self) -> int | None:
        status = self.store.read_status()
        if status and status.get("indexer_name") == self.indexer_name:
            return status.get("last_processed_block")
        return None

    def _status(self, last: int, head: int) -> dict:
        return {
            "indexer_name": self.indexer_name,
            "last_processed_block": last,
            "chain_head_at_last_poll": head,
        }

    # -- the cycle (src/main.rs:71-337) -----------------------------------

    def run_cycle(self) -> CycleResult:
        head = self._with_retry(self.client.get_block_number)  # O-1
        last = self.last_processed()
        if last is None:
            last = self.start_block - 1
        if last >= head:
            return CycleResult("idle")  # caught up; caller sleeps

        # O-2: bounded range scan
        to_block = min(last + self.blocks_per_batch, head)
        raw_batch = [
            self._with_retry(self.client.get_block_with_txs, n)
            for n in range(last + 1, to_block + 1)
        ]
        raw_batch = [b for b in raw_batch if b is not None]
        if not raw_batch:
            return CycleResult("idle")

        # O-10: reorg detection — compare the first new block's parent_hash
        # with the stored hash at its parent height (src/main.rs:166-189).
        first = raw_batch[0]
        parent_height = first["number"] - 1
        stored_parent = self._stored_hash_at(parent_height)
        if stored_parent is not None and stored_parent != first["parent_hash"].lower():
            # O-11: the stored parent is not canonical → retract it (and
            # everything above) in one atomic swap; checkpoint steps back
            # so the next cycle re-ingests from the fork. Deep reorgs
            # resolve iteratively, one parent-step per cycle.
            self.store.rollback_from(
                parent_height, status=self._status(parent_height - 1, head)
            )
            return CycleResult("reorg", rollback_from=parent_height)

        # O-3 receipt fan-out, then O-5/O-6 normalize
        enriched = [self._enrich_receipts(b) for b in raw_batch]
        tables = explode_batch(self.spark, enriched)

        # continuous aggregate: per-batch hourly partials ride in the
        # same atomic commit (ingest/rollup.py)
        from .rollup import ROLLUP_TABLE, rollup_partials

        tables[ROLLUP_TABLE] = rollup_partials(tables["logs"], tables["blocks"])

        # O-7/O-8/O-9: one atomic manifest swap for data + checkpoint;
        # idempotent under crash-replay via the txn watermark.
        self.store.commit(
            tables,
            status=self._status(to_block, head),
            txn_app_id=self.indexer_name,
            txn_version=to_block,
        )
        maintained = None
        if self.maintain_every_cycles is not None:
            self._cycles_since_maintain += 1
            if self._cycles_since_maintain >= self.maintain_every_cycles:
                self._cycles_since_maintain = 0
                from .rollup import ROLLUP_TABLE

                maintained = {
                    t: self.store.maintain(
                        t, max_fragments=self.maintain_max_fragments
                    )
                    for t in ("blocks", "transactions", "logs", ROLLUP_TABLE)
                }
        return CycleResult(
            "ingested",
            from_block=first["number"],
            to_block=to_block,
            maintained=maintained,
        )

    def _stored_hash_at(self, height: int) -> str | None:
        rows = (
            self.store.read("blocks", min_block=height, max_block=height)
            .filter(f"block_number = {height}")
            .select("block_hash")
            .limit(1)
            .collect()
        )
        return rows[0][0] if rows else None

    def run_until_caught_up(self, max_cycles: int = 100) -> list[CycleResult]:
        """Drive cycles until idle (test/backfill helper; the streaming
        wrapper adds the 10 s trigger cadence)."""
        out: list[CycleResult] = []
        for _ in range(max_cycles):
            res = self.run_cycle()
            out.append(res)
            if res.kind == "idle":
                break
        return out
