"""Z-order (Morton) clustering key for multi-dimensional compaction.

The base compaction layout is block-range clustering — optimal for block
scans and reorg rollback, but it puts EVERY hot address in EVERY
fragment: an address point query cannot prune a single fragment, because
each fragment spans the whole address space (measured: blooms keep all
fragments, `tools/bloom_bench.py` "address IS everywhere" case).

Interleaving the bits of both dimensions into one sort key tiles the
(block, address) plane into rectangles: each compacted fragment covers a
BOUNDED RANGE OF BOTH columns.  Block-range queries still prune via the
manifest's min/max tier (ranges are ~√f wider than pure block sort for f
fragments — the z-order trade), and address point queries now prune via
the existing bloom sidecars, because an address falls inside only the
fragments whose tile contains it.  No new manifest machinery: z-order
changes WHAT the per-fragment stats/blooms contain, and the established
tiers do the pruning.

This is the same design as Delta Lake's OPTIMIZE ZORDER BY /
ClickHouse's mortonEncode index — built here from Spark built-ins
(`shiftright`/`bitwiseAND`/`shiftleft` stay inside whole-stage codegen;
the 16·n-term OR chain compiles to straight-line JVM bit math).

Key construction, per column:
- numeric → scaled to 16-bit buckets against driver-computed min/max
  (one tiny agg job; uniform bucketing matches the hash-like uniformity
  of the columns worth z-ordering);
- hex string (``0x…`` address/hash, lowercase per the ingest contract) →
  first 12 hex digits as a 48-bit int (order-preserving on fixed-width
  lowercase hex), then the same scaling;
- NULL → bucket 0 (sorts first, stays prunable).

Bits interleave LSB-first: bit ``i`` of column ``j`` lands at position
``i·ncols + j``, so the high bits of every column dominate jointly — the
Morton property that makes a contiguous key range a bounded rectangle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY_BITS_PER_COL = 16
_SCALE_MAX = (1 << ZKEY_BITS_PER_COL) - 1  # 65535


def _numeric_view(df: DataFrame, col: str) -> Column:
    """Order-preserving int64 view of a z-order column."""
    dtype = dict(df.dtypes)[col]
    if dtype in ("string",):
        # fixed-width lowercase hex: strip "0x", first 12 digits → 48-bit
        # int.  conv() returns a string; the cast is exact (< 2^63).
        return F.coalesce(
            F.conv(F.substring(F.lower(F.col(col)), 3, 12), 16, 10).cast("long"),
            F.lit(0),
        )
    return F.coalesce(F.col(col).cast("long"), F.lit(0))


def with_zorder_key(
    df: DataFrame, cols: tuple[str, ...], *, key_name: str = "_zkey"
) -> DataFrame:
    """Append the Morton key column computed over ``cols``.

    One driver-side agg computes each column's min/max (the only extra
    job — O(columns) scalars, map-side-combined); the key itself is a
    pure codegen expression, no shuffle, no Python."""
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns; use a plain sort for 1")
    views = {c: _numeric_view(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(views[c]).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(views[c]).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    scaled = []
    for i, c in enumerate(cols):
        lo = bounds[f"lo_{i}"] or 0
        hi = bounds[f"hi_{i}"] or 0
        span = max(hi - lo, 1)
        # ratio in double BEFORE multiplying: a 48-bit hex view × 65535
        # overflows int64, and 53 mantissa bits are ample for 16-bit
        # bucket resolution
        ratio = (views[c] - F.lit(lo)).cast("double") / F.lit(float(span))
        scaled.append(
            F.least(
                F.lit(_SCALE_MAX),
                F.greatest(F.lit(0), (ratio * _SCALE_MAX).cast("long")),
            )
        )
    n = len(cols)
    bits = [
        F.shiftleft(
            F.shiftright(u, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(ZKEY_BITS_PER_COL)
        for j, u in enumerate(scaled)
    ]
    return df.withColumn(key_name, reduce(lambda a, b: a.bitwiseOR(b), bits))
