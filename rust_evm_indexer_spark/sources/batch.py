"""Batch parquet sources with explicit schemas.

Two table families:

- the driver-provided generic tables at ``$SF_DIR/{name}.parquet``
  (TESTDATA.md) — schema comes from parquet footers (they are the oracle's
  ground truth, so we take them verbatim);
- EVM-shaped tables (fixtures or store output) — read through the explicit
  StructTypes in ``schemas.py`` so drift fails loudly.

All reads are plain ``spark.read.parquet`` — Catalyst predicate pushdown,
column pruning, and row-group skipping apply downstream.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DRIVER_TABLES, EVM_SCHEMAS


def load_driver_table(spark: SparkSession, sf_dir: str | Path, name: str) -> DataFrame:
    """Read one driver table.  Parquet TIMESTAMP(NANOS) columns (the
    ``events.ts`` physical type) are unsupported by Spark's vectorized
    reader, so they are read as nano longs (``nanosAsLong``) and normalized
    back to TimestampType at the scan — a codegen'd projection, precision
    truncated ns→µs exactly like DuckDB's ``epoch_us``.

    The session timezone is pinned to UTC here because the caller (the
    driver) owns the SparkSession: timestamp *literals* in catalog queries
    parse in session tz, and the DuckDB oracle's timestamps are UTC-naive —
    a non-UTC session would shift every literal boundary."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_driver_tables(
    spark: SparkSession, sf_dir: str | Path, names: tuple[str, ...] = DRIVER_TABLES
) -> dict[str, DataFrame]:
    return {n: load_driver_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str | Path, names: tuple[str, ...] = DRIVER_TABLES
) -> None:
    """Register the driver tables as temp views for the SQL surface."""
    for n in names:
        load_driver_table(spark, sf_dir, n).createOrReplaceTempView(n)


def load_evm_tables(spark: SparkSession, fixture_dir: str | Path) -> dict[str, DataFrame]:
    """Read EVM-shaped parquet through the declared StructTypes."""
    out: dict[str, DataFrame] = {}
    for name, schema in EVM_SCHEMAS.items():
        path = Path(fixture_dir) / f"{name}.parquet"
        if path.exists():
            out[name] = spark.read.schema(schema).parquet(str(path))
    return out
