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
    the engine's extension for aggregations over wei/gas.  try_cast, not
    cast: under ANSI mode (Spark 4 default) a plain cast *throws* on
    overflow — the documented contract is NULL, never an aborted job.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(U256_DECIMAL)


def wei_to_eth(col: Column | str) -> Column:
    """Wei decimal-string → ETH as decimal(38,18), exact.

    Implemented by inserting the decimal point 18 digits from the right
    (string ops, whole-stage codegen'd): decimal *division* by 10^18
    would pass through Spark's decimal result-type rules and round to 6
    fractional digits for wide operands — string splitting never loses a
    wei.  Values ≥ 10^38 wei don't fit the decimal and yield NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    padded = F.when(F.length(c) < 19, F.lpad(c, 19, "0")).otherwise(c)
    int_part = padded.substr(F.lit(1), F.length(padded) - 18)
    frac = padded.substr(F.length(padded) - 17, F.lit(18))
    return F.concat(int_part, F.lit("."), frac).try_cast("decimal(38,18)")


def flatten_topics(topics: Column | str) -> list[Column]:
    """``array<string>`` topics → positional ``topic0..topic3`` columns
    (mirrors src/db.rs:164-167; 1-based, NULL beyond the array end —
    try_element_at because ANSI-mode element_at throws out-of-bounds)."""
    c = F.col(topics) if isinstance(topics, str) else topics
    return [F.try_element_at(c, F.lit(i + 1)).alias(f"topic{i}") for i in range(4)]


def hex_to_u256_decimal(col: Column | str) -> Column:
    """0x-prefixed 256-bit hex → DecimalType(38,0), JVM-side bignum.

    ``conv(_, 16, 10)`` is 64-bit only, so the word is decoded as two
    limbs combined with decimal arithmetic.  Exact for values < 2¹²⁴
    (≈2.1e37 — covers every real token amount: total ETH supply in wei is
    ~1.2e26); larger values yield NULL, never a wrong number.  This is
    the engine's ABI-decode primitive (e.g. the Transfer amount in
    ``logs.data``).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.lpad(F.lower(F.regexp_replace(c, "^0x", "")), 64, "0")
    # two limbs: high 15 nibbles (60 bits) · 2^64 + low 16 nibbles.
    # Guarded to values < 2^124 (top 33 nibbles zero) so the decimal
    # arithmetic can never overflow at runtime — ANSI mode turns a
    # decimal overflow into a job-killing error, and try_cast only
    # protects casts, not intermediate products.
    fits = h.substr(1, 33) == F.lit("0" * 33)
    two64 = F.lit("18446744073709551616").cast("decimal(20,0)")  # 2^64
    hi = F.conv(h.substr(34, 15), 16, 10).try_cast("decimal(38,0)")
    lo = F.conv(h.substr(49, 16), 16, 10).try_cast("decimal(38,0)")
    return F.when(fits, (hi * two64 + lo).try_cast(U256_DECIMAL)).otherwise(
        F.lit(None).cast(U256_DECIMAL)
    )


#: bit widths for the packed deterministic log id (see :func:`pack_log_id`)
_TXI_BITS = 18  # up to 262k txs per block (mainnet max ≈ 1.4k)
_LI_BITS = 12  # up to 4096 logs per tx (mainnet max ≈ hundreds)


def pack_log_id(block_number: Column, tx_index: Column, log_index: Column) -> Column:
    """Deterministic surrogate for the reference's ``id BIGSERIAL``
    (init.sql:50): ``(block_number << 30) | (tx_index << 12) | log_index``.

    Properties the cursor semantics need (SURVEY.md §7 hard-part 1):
    - strictly increasing in ``(block_number, tx_index, log_index)``, so
      ORDER BY (block_number, id) equals the reference's insertion order;
    - stable across crash-replays and reorg rewrites (pure function of
      position — unlike ``monotonically_increasing_id()``);
    - assigned with zero coordination: no window, no shuffle, no driver
      sequence — each executor computes it locally at any scale.

    Bounds: block_number < 2^33, tx_index < 2^18, log_index < 2^12 —
    all orders of magnitude beyond real chains.
    """
    return (
        F.shiftleft(block_number, _TXI_BITS + _LI_BITS)
        .bitwiseOR(F.shiftleft(F.coalesce(tx_index, F.lit(0)), _LI_BITS))
        .bitwiseOR(F.coalesce(log_index, F.lit(0)))
    )


def ts_seconds_to_timestamp(col: Column | str) -> Column:
    """Unix-seconds BIGINT → TimestampType derived column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)
