"""gapfill_locf semantics on synthetic data with REAL gaps — the
catalog oracle proves cross-engine agreement, this proves the fill
logic itself (the driver corpus may have no empty buckets)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators.temporal import gapfill_locf

HOUR_US = 3_600_000_000


def test_gaps_are_filled_with_locf_and_zero_counts(spark):
    rows = [
        # key 'a': observations in hour 0 and hour 3 — hours 1-2 are gaps
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 5.0),
        ("a", datetime(2024, 1, 1, 3, 30), 7.0),
        # key 'b': only hour 2 — hours 0-1 precede any observation
        ("b", datetime(2024, 1, 1, 2, 15), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = gapfill_locf(df, "ts", ["k"], "value")
    got = {
        (r["k"], r["hour_us"]): (r["n"], r["filled_value"]) for r in out.collect()
    }
    base = int(datetime(2024, 1, 1).timestamp() * 1e6)  # session tz = UTC
    # complete 4-hour spine for BOTH keys
    assert len(got) == 8
    assert got[("a", base + 0 * HOUR_US)] == (2, 15.0)
    assert got[("a", base + 1 * HOUR_US)] == (0, 15.0)  # gap: LOCF
    assert got[("a", base + 2 * HOUR_US)] == (0, 15.0)  # gap: LOCF
    assert got[("a", base + 3 * HOUR_US)] == (1, 7.0)
    assert got[("b", base + 0 * HOUR_US)] == (0, 0.0)  # before first obs
    assert got[("b", base + 1 * HOUR_US)] == (0, 0.0)
    assert got[("b", base + 2 * HOUR_US)] == (1, 2.0)
    assert got[("b", base + 3 * HOUR_US)] == (0, 2.0)  # trailing LOCF


def test_spine_is_distributed_not_collected(spark):
    """The bounds→sequence spine must not round-trip through the driver:
    no .collect() in the operator, and the plan contains the sequence
    generator."""
    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0, 0), 1.0)], "k string, ts timestamp, value double"
    )
    out = gapfill_locf(df, "ts", ["k"], "value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "sequence(" in plan
