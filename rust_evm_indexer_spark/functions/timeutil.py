"""Timestamp-type-agnostic epoch extraction.

The driver's testdata parquet stores naive ``timestamp[us]`` values
(no UTC adjustment), which a vanilla Spark 4 session infers as
``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ.enabled`` is
true by default).  ``F.unix_micros`` only accepts ``TIMESTAMP`` (LTZ)
and raises ``DATATYPE_MISMATCH`` on NTZ input, so any epoch extraction
in catalog-facing output must go through :func:`ts_micros` instead.

``ts_micros`` routes through ``TIMESTAMP_NTZ`` and measures microseconds
from the naive epoch with ``timestamp_diff`` — for NTZ (and DATE) input
the result is byte-identical to DuckDB's ``epoch_us`` in EVERY session
timezone, because no wall-clock→instant interpretation happens at all.
LTZ input is first rendered to a naive wall clock in the session
timezone (identity under the driver's UTC sessions).
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

def ts_micros(col: Column | str) -> Column:
    """Microseconds since the naive epoch for TIMESTAMP_NTZ / TIMESTAMP /
    DATE input alike (bigint).  DuckDB twin: ``epoch_us(col)``.

    HARD PRECONDITION for TIMESTAMP (LTZ) input: the session timezone
    must be UTC.  The LTZ→NTZ cast renders the instant as a wall clock
    in ``spark.sql.session.timeZone`` — under UTC that equals the
    tz-independent ``unix_micros``, under any other tz the epochs shift
    silently.  TIMESTAMP_NTZ and DATE input never consult a timezone.
    Call sites that read LTZ columns (e.g. reorg_rollup_exact) pin the
    session tz themselves; new callers must do the same.

    The epoch literal is built per-call, NOT at module scope: this module
    is imported by executor Python workers (via the package __init__ on
    mapInPandas stages), where no JVM gateway exists — a module-level
    ``F.lit`` would crash every Python-backed stage."""
    c = F.col(col) if isinstance(col, str) else col
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    # comparing against TIMESTAMP_NTZ never consults a timezone
    return F.timestamp_diff("MICROSECOND", epoch, c.cast("timestamp_ntz"))


def require_utc_session(spark) -> None:
    """Assert :func:`ts_micros`'s HARD PRECONDITION for TIMESTAMP (LTZ)
    input: the session timezone must be UTC, or the LTZ→NTZ rendering
    silently shifts every epoch by the zone offset.  Call this at any
    site that applies ``ts_micros`` to an LTZ column (NTZ/DATE input
    never consults a timezone and needs no guard).  Raises instead of
    returning wrong data — a shifted epoch is a silent-corruption bug,
    not a recoverable condition."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            "ts_micros over a TIMESTAMP (LTZ) column requires "
            f"spark.sql.session.timeZone=UTC (session has {tz!r}): the "
            "LTZ value would be rendered as a wall clock in that zone "
            "and the extracted epoch silently shifted.  Pin UTC before "
            "building the plan (see catalog.reorg_rollup_exact)."
        )
