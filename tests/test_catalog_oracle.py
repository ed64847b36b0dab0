"""Local replay of the driver's correctness gate: every catalog entry's
Spark result must match its DuckDB oracle at sf0.01 (row count + column
names + order-insensitive values)."""

from __future__ import annotations

import pytest

from rust_evm_indexer_spark.catalog import CATALOG

from compare import assert_frames_match
from conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_entry_matches_oracle(spark, duck, name):
    entry = CATALOG[name]
    got = entry.fn(spark, str(SF_ORACLE))
    if entry.oracle is None:
        assert got.count() >= 0  # rows-only check, mirrors the driver
        return
    assert_frames_match(got, duck.execute(entry.oracle).df(), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
