"""Structured-Streaming wrapper for the EVM ingest loop.

The reference's ingester is a ``tokio`` task polling every 10 s
(``src/main.rs:24,71-337``).  Its Spark shape (SURVEY.md §1.4): a
Structured Streaming query whose *trigger* provides the poll cadence and
whose ``foreachBatch`` hook runs one ingest cycle — head discovery, range
scan, receipt fan-out, reorg check, atomic commit — against the table
store.  The rate source is a metronome only; offsets/data come from the
chain client, and exactly-once is owned by the store's idempotent
manifest commits (a replayed epoch re-runs a cycle whose txn watermark
makes it a no-op).

Why not a custom streaming Source?  A DataSourceV2 stream source would
bind the chain to Spark's offset log, but the reference's semantics pin
the checkpoint to the *store* (same transaction as the data), which is
strictly stronger than a source-side offset log (no dual-commit problem).
The rate-trigger + foreachBatch shape preserves that while still giving
operators the StreamingQuery lifecycle (start/stop/status/await).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..ingest.commit import POLL_INTERVAL_SECONDS, CycleResult, EvmIngester
from ..store.table_store import MaintenancePolicy


class IngestStream:
    """Run an :class:`EvmIngester` on a Structured-Streaming trigger.

    ``maintenance_policy`` closes the store-maintenance loop ON the
    ingest cadence (VERDICT r8 item 6): every ``maintain_every``-th
    cycle the tick also runs :meth:`TableStore.maintain_store` —
    compact/rebuild/refresh/vacuum per the policy — so a long-running
    deployment bounds its own read amplification instead of relying on
    an external timer.  Maintenance runs INSIDE the foreachBatch hook,
    i.e. never concurrently with an ingest commit (single-writer by
    construction, same as the reference's one ingester task); readers
    and changefeed consumers stay concurrent and exact throughout
    (tools/soak_store.py drives that combination).  Reports accumulate
    in ``maintenance_reports`` for ops visibility."""

    def __init__(
        self,
        spark: SparkSession,
        ingester: EvmIngester,
        *,
        poll_interval_seconds: float = POLL_INTERVAL_SECONDS,
        maintenance_policy: MaintenancePolicy | None = None,
        maintain_every: int = 8,
    ):
        if maintain_every < 1:
            raise ValueError("maintain_every must be >= 1")
        self.spark = spark
        self.ingester = ingester
        self.poll_interval_seconds = poll_interval_seconds
        self.maintenance_policy = maintenance_policy
        self.maintain_every = maintain_every
        self.results: list[CycleResult] = []
        self.maintenance_reports: list[dict] = []
        self._query: StreamingQuery | None = None

    def _tick(self, _batch_df, _epoch_id: int) -> None:
        self.results.append(self.ingester.run_cycle())
        if (
            self.maintenance_policy is not None
            and len(self.results) % self.maintain_every == 0
        ):
            self.maintenance_reports.append(
                self.ingester.store.maintain_store(self.maintenance_policy)
            )

    def start(self) -> StreamingQuery:
        """Begin polling at the configured cadence
        (``Trigger.ProcessingTime`` ≙ ``POLL_INTERVAL_SECONDS``)."""
        self._query = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.trigger(
                processingTime=f"{self.poll_interval_seconds} seconds"
            )
            .foreachBatch(self._tick)
            .queryName("evm_ingest_stream")
            .start()
        )
        return self._query

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def await_cycles(self, n: int, timeout_seconds: float = 60.0) -> list[CycleResult]:
        """Block until at least ``n`` cycles ran (test/ops helper)."""
        import time

        deadline = time.monotonic() + timeout_seconds
        while len(self.results) < n and time.monotonic() < deadline:
            time.sleep(0.05)
        return list(self.results)
