"""Streaming consumption of the store changefeed.

The batch primitive (:meth:`TableStore.changes`) answers "what was
added between version A and B"; this wrapper turns it into a continuous
downstream consumer — the shape a training-data pipeline runs against a
live store: every trigger, deliver exactly the rows appended since the
last consumed manifest version to a callback (append to a feature
table, push to a tokenizer queue, refresh an index).

Same design stance as :class:`IngestStream`: the Structured Streaming
rate source is a metronome only; progress is owned by a version
checkpoint FILE (JSON beside the consumer, written after the callback
returns), not Spark's offset log.  Delivery is therefore at-least-once
across a crash *between* callback and checkpoint write — the callback
should be idempotent on re-delivery of one window (e.g. an idempotent
commit keyed by ``to_version``, exactly the store's own txn-watermark
pattern).  Within a healthy run each row is delivered exactly once,
inherited from the changefeed's derived-fragment contract.

Reorg posture is surfaced, not hidden: a window containing a rollback
raises inside :meth:`TableStore.changes` unless the consumer opted in
(``allow_reorged=True``), so a fork can never silently corrupt a
downstream corpus."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..store.table_store import TableStore


class ChangefeedStream:
    """Poll a table's changefeed on a trigger cadence and hand each
    non-empty delta to ``on_delta(df, from_version, to_version)``."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        table: str,
        on_delta: Callable[[DataFrame, int, int], None],
        *,
        checkpoint_path: str | Path,
        poll_interval_seconds: float = 10.0,
        allow_reorged: bool = False,
        include_deletes: bool = False,
    ):
        self.spark = spark
        self.store = store
        self.table = table
        self.on_delta = on_delta
        self.checkpoint_path = Path(checkpoint_path)
        self.poll_interval_seconds = poll_interval_seconds
        self.allow_reorged = allow_reorged
        #: opt-in compliance feed: deltas additionally carry rows removed
        #: by delete_equals, tagged _change_type='delete' with a
        #: _commit_version for version-ordered replay (the callback MUST
        #: branch on _change_type; see TableStore.changes)
        self.include_deletes = include_deletes
        self._query: StreamingQuery | None = None

    # -- version checkpoint ------------------------------------------------

    def last_consumed(self) -> int:
        if self.checkpoint_path.exists():
            return json.loads(self.checkpoint_path.read_text())["version"]
        return 0  # genesis: consume everything ever appended

    def _save_checkpoint(self, version: int) -> None:
        tmp = self.checkpoint_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version, "table": self.table}))
        tmp.replace(self.checkpoint_path)  # atomic on POSIX

    # -- one poll ----------------------------------------------------------

    def poll_once(self) -> int:
        """Consume one window; returns rows delivered (0 = caught up).
        Public so tests and batch callers can drive the cadence
        themselves — the streaming trigger just calls this."""
        since = self.last_consumed()
        to = self.store.current_manifest().version
        if to <= since:
            return 0
        delta = self.store.changes(
            self.table,
            since_version=since,
            to_version=to,
            allow_reorged=self.allow_reorged,
            include_deletes=self.include_deletes,
        )
        n = delta.count()
        if n > 0:
            self.on_delta(delta, since, to)
        # advance even over empty windows (maintenance-only versions), so
        # the next poll's window stays O(new versions)
        self._save_checkpoint(to)
        return n

    # -- streaming lifecycle ----------------------------------------------

    def _tick(self, _batch_df, _epoch_id: int) -> None:
        self.poll_once()

    def start(self) -> StreamingQuery:
        self._query = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.trigger(
                processingTime=f"{self.poll_interval_seconds} seconds"
            )
            .foreachBatch(self._tick)
            .queryName(f"changefeed_{self.table}")
            .start()
        )
        return self._query

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
