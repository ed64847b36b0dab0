"""Count-min sketch: mergeable frequency estimation in sublinear space.

Completes the sketch family (HLL++ distinct counts, Greenwald-Khanna
quantiles — both Spark built-ins surfaced in the catalog) with the one
Spark lacks natively as a queryable structure: per-key frequency in
``d x w`` integer counters (Cormode & Muthukrishnan '05).  Every key
increments one counter per hash row; an estimate is the MIN over its
``d`` counters — always ≥ the true count, and ≤ true + εN with high
probability for ε = e/w.

Why it matters at 100 TB: the counter table is ``d·w`` integers no
matter the data size, built with ONE partial-aggregated shuffle of
``d·N`` rows, and counters from different partitions / days / streams
merge by plain addition — the streaming-friendly property exact
per-key counts lack (their state is the key cardinality).  Evaluating
estimates joins the (broadcast-sized) counter table back to probe keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_estimates(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 4096,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` and evaluate it at
    every distinct key, returning ``(key_col, n_exact, n_est)`` —
    ``n_exact`` rides along so callers (and the driver oracle) can
    check the one-sided CMS bound ``n_exact <= n_est``.

    Deterministic: buckets are seeded xxhash64, counters are exact
    integer sums, and min() is order-free — the same data always yields
    the same estimates, so bound checks cannot flake under shuffle
    reordering."""
    hashes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(width))
            for i in range(depth)
        ]
    )
    exploded = df.select(F.col(key_col), F.posexplode(hashes).alias("i", "bucket"))
    counters = exploded.groupBy("i", "bucket").agg(F.count("*").alias("c"))
    probe = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n_exact"))
        .select(key_col, "n_exact", F.posexplode(hashes).alias("i", "bucket"))
    )
    return (
        probe.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy(key_col, "n_exact")
        .agg(F.min("c").cast("bigint").alias("n_est"))
    )
