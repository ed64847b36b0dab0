"""Runtime utilities."""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_SHIPPED: set[int] = set()


def spread_small_input(
    df: DataFrame, key: str | None = None, target: int | None = None
) -> DataFrame:
    """Scale-adaptive scan spreading (optimization guide §2.5: one
    unsplittable input file ⇒ "repartition immediately after the read").

    The local test corpora are single-row-group parquet files, so the
    scan — and every narrow transform ABOVE it (normalize / split /
    k-gram explode / hash chains, exactly where the dedup and text
    operators spend their compute) — runs as ONE task on one core.
    Repartitioning the raw rows first costs one tiny exchange (the
    un-exploded documents) and parallelizes the expensive exploded
    stage across the executor width.

    Scale adaptivity: the repartition fires only when the scan is
    narrower than half the default parallelism.  On a real layout
    (100 TB ⇒ tens of thousands of row-group splits) the partition
    count already exceeds the core count and this is a NO-OP — the
    added shuffle is bounded by (cores × maxPartitionBytes), never
    data-scaled.  With ``key`` the exchange is hash partitioning (no
    sort-before-repartition pass); otherwise round-robin.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # non-scan frames with exotic plans: leave as-is
        return df
    if n * 2 >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Closures that cross the Python-worker boundary (``mapInPandas``
    kernels, pickled connector clients) reference module-level symbols by
    *module path* — the driver process importing the package is not
    enough, because workers have their own ``sys.path`` (pytest masks
    this by running with the repo as cwd; a driver launched elsewhere
    does not).  ``addPyFile`` of a package zip is the cluster-correct
    fix: Spark distributes it to every executor and prepends it to the
    worker path.  Idempotent per SparkContext.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.mkdtemp(prefix="pkgship-")) / "rust_evm_indexer_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(str(zpath))
    _SHIPPED.add(key)
