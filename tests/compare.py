"""Local analog of the driver's DuckDB-oracle compare: row count + column
names + order-insensitive value equality.  Used by parity tests so that a
query passing here should also pass the driver's CORRECTNESS gate."""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (datetime, date, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_canon_value(x) for x in seq)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_frames_match(spark_df, oracle_df: pd.DataFrame, label: str = "") -> None:
    got = spark_df.toPandas() if not isinstance(spark_df, pd.DataFrame) else spark_df
    assert sorted(got.columns) == sorted(oracle_df.columns), (
        f"{label}: column mismatch {sorted(got.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(got) == len(oracle_df), (
        f"{label}: row count {len(got)} vs oracle {len(oracle_df)}"
    )
    a, b = _canon_rows(got), _canon_rows(oracle_df)
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"{label}: row {i} differs:\n  spark:  {ra}\n  oracle: {rb}"


def assert_matches_sql(spark_df, duck, sql: str, label: str = "") -> None:
    assert_frames_match(spark_df, duck.execute(sql).df(), label or sql[:60])
