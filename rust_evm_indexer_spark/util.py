"""Runtime utilities."""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


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
