"""Column-level EVM helpers: hex normalization, U256 arithmetic, topics.

All pure built-in ``pyspark.sql.functions`` compositions — JVM-side,
whole-stage-codegen'd, no Python UDFs.  These mirror the value conventions of
the reference's write path (``src/db.rs:84-89,116-127,161-170``: lowercase
``0x…`` hex, U256 as decimal strings) and its read path
(``src/api.rs:127,141``: case-insensitive compares).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DecimalType wide enough for any practical wei value (< 10^38 covers total
#: ETH supply in wei ~1.2e26; full U256 overflows → stays NULL, documented).
U256_DECIMAL = "decimal(38,0)"


def norm_hex(col: Column | str) -> Column:
    """Canonical lowercase hex, mirroring Rust ``format!("{:#x}")``."""
    return F.lower(F.col(col) if isinstance(col, str) else col)


def hex_eq(col: Column | str, value: str) -> Column:
    """Case-insensitive hash/address equality (``LOWER(x) = LOWER($v)``,
    src/api.rs:126-129).  The column side is lowercased at ingest, so only
    the literal needs normalizing — keeps the predicate pushable to the
    parquet scan (a ``lower(col)`` wrapper would defeat min/max pruning)."""
    c = F.col(col) if isinstance(col, str) else col
    return c == F.lit(value.lower())


def u256_to_decimal(col: Column | str) -> Column:
    """U256-as-TEXT → DecimalType(38,0); values ≥ 10^38 become NULL.

    The reference never does arithmetic on these (SURVEY.md §1.3); this is
    the engine's extension for aggregations over wei/gas.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(U256_DECIMAL)


def wei_to_eth(col: Column | str) -> Column:
    """Wei decimal-string → ETH as decimal(38,18)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(38,0)") / F.lit(10).cast("decimal(20,0)") ** 18).cast(
        "decimal(38,18)"
    )


def flatten_topics(topics: Column | str) -> list[Column]:
    """``array<string>`` topics → positional ``topic0..topic3`` columns
    (mirrors src/db.rs:164-167; element_at is 1-based)."""
    c = F.col(topics) if isinstance(topics, str) else topics
    return [
        F.element_at(c, i + 1).alias(f"topic{i}") for i in range(4)
    ]


def ts_seconds_to_timestamp(col: Column | str) -> Column:
    """Unix-seconds BIGINT → TimestampType derived column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)
