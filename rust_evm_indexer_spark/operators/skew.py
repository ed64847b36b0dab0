"""Salted two-phase top-k for hot-partition window skew.

Where Spark already solves skew (verified against the physical plans,
see tests/test_skew.py):

- ``groupBy(hot).agg(sum/count/...)`` — partial aggregation (map-side
  combine) means the shuffle carries |mappers| x |keys| partial states,
  never the raw rows of the hot key.
- ``groupBy(hot).agg(countDistinct(v))`` — the planner's distinct
  rewrite shuffles on ``(key, v)`` first (skew-spread by the value),
  then merges tiny partial counts; a hand-salted variant adds nothing.
- skewed sort-merge JOINs — AQE's skew-join splitting.

What Spark does NOT solve: **window functions partitioned by a hot
key**.  ``row_number().over(Window.partitionBy(hot))`` materializes the
ENTIRE hot partition in one task — no partial aggregation exists for
windows, and AQE cannot split a window partition.  At 100 TB a top-k
over 5 event types (or one dominant ``topic0`` — Transfer is most of
mainnet) sorts terabytes in 5 tasks while the cluster idles.

The fix is the classic salted two-phase top-k: give every row a
deterministic salt, take top-k within each ``(key, salt)`` sub-partition
(parallel — any global top-k row is necessarily within the top-k of its
own bucket), then re-rank the ≤ ``n_salt * k`` survivors per key in a
second, tiny window.  Exactness requires a TOTAL order (a tiebreaker
column), otherwise rows tied at the boundary make either phase
nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    *,
    n_salt: int = 32,
    rank_alias: str = "rnk",
) -> DataFrame:
    """Exact top-``k`` rows per ``keys`` under ``order_by`` (which must
    be a total order — include a tiebreaker), computed as a salted
    two-phase window so no task ever sorts a whole hot partition.

    The salt is a whole-row hash — deterministic (stable under task
    retry / speculative execution, unlike ``rand()``), and correct for
    any row→bucket assignment since top-k survives arbitrary splits.
    Phase 2 recomputes ``row_number`` so ``rank_alias`` is the global
    1..k rank, identical to the one-phase window's output.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_salt", "_r")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return survivors.withColumn(rank_alias, F.row_number().over(w2)).where(
        F.col(rank_alias) <= k
    )
