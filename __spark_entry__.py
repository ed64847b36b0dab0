"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship filtered+cursor-paginated log-search
shape on sf0.001; ``queries()`` / ``oracle_sql()`` expose the engine's
query catalog (``rust_evm_indexer_spark.catalog``) — one entry per
implemented operator from SURVEY.md §2, each paired with a DuckDB-runnable
ANSI-SQL oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rust_evm_indexer_spark.catalog import CATALOG  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core value is the filtered + keyset-cursor-paginated
    log search (POST /logs, src/api.rs:111-229); this runs that shape on
    the events table (event_type ≙ topic0, (ts,event_id) ≙ cursor tuple).
    """
    return CATALOG["logs_keyset_page"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    # the EVM-native entries' oracles read fixture parquet by absolute
    # path — make sure it exists before EITHER side of the compare runs
    # (pure pyarrow write, deterministic, idempotent)
    from rust_evm_indexer_spark.catalog import (
        ensure_evm_fixture_parquet,
        ensure_u256_fixture_parquet,
    )

    ensure_evm_fixture_parquet()
    ensure_u256_fixture_parquet()
    return {name: e.fn for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
