"""Streaming exact deduplication (the streaming twin of X-1).

An at-least-once delivery pipeline re-delivers events; the streaming
dedup drops re-deliveries of the same key within the watermark horizon
using ``dropDuplicatesWithinWatermark`` — the first arrival is emitted
immediately (append mode), later duplicates are swallowed while their
key fingerprint is in state.

State boundedness is the scale property: the fingerprint store holds
only keys younger than the watermark delay, so state size is
(arrival rate × delay), independent of stream lifetime — an unbounded
``dropDuplicates`` on an infinite stream OOMs by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup_exact(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    *,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate deliveries of the same ``keys`` tuple arriving
    within ``watermark`` of each other.  Works on a ``readStream`` frame
    (stateful, watermark-bounded); on a batch frame Spark evaluates the
    same plan as a plain distinct-by-key."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
