"""Shared fixtures: one SparkSession per test session, EVM fixture chain,
driver testdata dirs, and a DuckDB connection with the same tables — the
local analog of the driver's oracle gate."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from rust_evm_indexer_spark import datagen  # noqa: E402
from rust_evm_indexer_spark.session import get_spark  # noqa: E402
from rust_evm_indexer_spark.sources import load_evm_tables  # noqa: E402

TESTDATA = Path("/root/testdata")
SF_SMOKE = TESTDATA / "sf0.001"
SF_ORACLE = TESTDATA / "sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def evm_dir(tmp_path_factory) -> Path:
    out = tmp_path_factory.mktemp("evm_fixtures")
    datagen.write_fixtures(out)
    return out


@pytest.fixture(scope="session")
def evm(spark, evm_dir):
    """dict of blocks/transactions/logs/indexer_status DataFrames."""
    return load_evm_tables(spark, evm_dir)


@pytest.fixture(scope="session")
def duck(evm_dir):
    """DuckDB connection with both fixture families registered as views."""
    con = duckdb.connect()
    for name in ("blocks", "transactions", "logs", "indexer_status"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{evm_dir}/{name}.parquet')"
        )
    for p in sorted(SF_ORACLE.glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')"
        )
    return con
