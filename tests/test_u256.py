"""U256-as-TEXT arithmetic extension (SURVEY.md §7 hard-part 3): decimal
compute columns over the reference's string-fidelity storage, verified
against DuckDB HUGEINT math."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_evm_indexer_spark.functions.evm import u256_to_decimal, wei_to_eth


def test_wei_sum_matches_hugeint(evm, duck):
    got = (
        evm["transactions"]
        .agg(F.sum(u256_to_decimal("value")).cast("decimal(38,0)").alias("total"))
        .first()["total"]
    )
    want = duck.execute(
        "SELECT SUM(CAST(value AS HUGEINT)) FROM transactions"
    ).fetchone()[0]
    assert int(got) == int(want)


def test_wei_to_eth_precision(spark):
    df = spark.createDataFrame(
        [("1000000000000000000",), ("1",), ("123456789012345678901",)], ["value"]
    )
    out = {str(r[0]): r[1] for r in df.select("value", wei_to_eth("value")).collect()}
    from decimal import Decimal

    assert out["1000000000000000000"] == Decimal("1")
    assert out["1"] == Decimal("1E-18")
    assert out["123456789012345678901"] == Decimal("123.456789012345678901")


def test_u256_overflow_is_null_not_wrong(spark):
    """Values ≥ 10^38 exceed DecimalType(38,0): documented behavior is
    NULL (ANSI try-cast semantics), never a silently wrong number."""
    big = str(10**40)
    df = spark.createDataFrame([(big,), ("42",)], ["value"])
    rows = {r[0]: r[1] for r in df.select(
        "value", u256_to_decimal("value").alias("d")
    ).collect()}
    assert rows["42"] is not None and int(rows["42"]) == 42
    assert rows[big] is None


def test_gas_utilization(evm, duck):
    """Per-block gas utilization ratio from U256 strings."""
    got = {
        r["block_hash"]: r["util"]
        for r in evm["blocks"]
        .select(
            "block_hash",
            (
                u256_to_decimal("gas_used").cast("double")
                / u256_to_decimal("gas_limit").cast("double")
            ).alias("util"),
        )
        .collect()
    }
    want = dict(
        duck.execute(
            "SELECT block_hash, CAST(gas_used AS DOUBLE)/CAST(gas_limit AS DOUBLE) "
            "FROM blocks"
        ).fetchall()
    )
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12
