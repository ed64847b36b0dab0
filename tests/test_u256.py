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


def test_hex_to_u256_decimal(spark):
    from rust_evm_indexer_spark.functions.evm import hex_to_u256_decimal

    cases = [
        "0x" + "00" * 31 + "2a",                     # 42
        "0x" + "0" * 63 + "1",                        # 1, short-nibble form
        "0xde0b6b3a7640000",                          # 1 ETH in wei
        "0x" + format(10**30, "064x"),               # big token amount
        "0x" + format(2**124 - 1, "064x"),           # max representable
        "0x" + format(2**124, "064x"),               # first NULL
        "0x" + "ff" * 32,                             # max U256 → NULL
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["h"])
    got = {r["h"]: r["v"] for r in df.select("h", hex_to_u256_decimal("h").alias("v")).collect()}
    for c in cases:
        want = int(c, 16)
        if want < 2**124:
            assert int(got[c]) == want, c
        else:
            assert got[c] is None, c


def test_transfer_volume_decode(evm, duck):
    from rust_evm_indexer_spark.datagen import TRANSFER_SIG
    from rust_evm_indexer_spark.operators.evm_analytics import (
        transfer_volume_by_contract,
    )

    got = {
        r["contract_address"]: (r["n_transfers"], int(r["volume"]))
        for r in transfer_volume_by_contract(evm["logs"], TRANSFER_SIG).collect()
    }
    # fixture data payload is the constant 0x…2a = 42 per log
    want = {
        addr: (n, 42 * n)
        for addr, n in duck.execute(
            "SELECT contract_address, COUNT(*) FROM logs "
            f"WHERE topic0 = '{TRANSFER_SIG}' GROUP BY 1"
        ).fetchall()
    }
    assert got == want


def test_value_flow_by_block(evm, duck):
    from rust_evm_indexer_spark.operators.evm_analytics import value_flow_by_block

    got = {
        r["block_number"]: (r["n_txs"], int(r["wei_moved"]))
        for r in value_flow_by_block(evm["transactions"]).collect()
    }
    want = {
        bn: (n, int(w))
        for bn, n, w in duck.execute(
            "SELECT block_number, COUNT(*), SUM(CAST(value AS HUGEINT)) "
            "FROM transactions GROUP BY 1"
        ).fetchall()
    }
    assert got == want


def test_wei_sum_exact_straddles_decimal38(spark):
    """The 4-limb exact sum keeps every wei where the single-limb
    DECIMAL(38,0) contract nulls out: per-key totals above 10^38 must
    equal Python bigint arithmetic digit-for-digit (hypothesis-style
    fixed vectors across every limb boundary + full 78-digit U256)."""
    from rust_evm_indexer_spark.functions.evm import u256_to_decimal
    from rust_evm_indexer_spark.operators.evm_analytics import wei_sum_exact

    values = [
        0,
        1,
        10**19 - 1,          # l0 max
        10**19,              # first carry into l1
        10**38 - 1,          # single-limb edge (still representable)
        10**38,              # single-limb NULL regime starts
        10**57 - 1,
        10**57,
        2**255,
        2**256 - 1,          # U256 max
    ]
    rows = [("k", str(v)) for v in values] + [("k", None), ("k", "not-digits")]
    df = spark.createDataFrame(rows, "from_address: string, value: string")
    out = wei_sum_exact(df, "from_address").collect()
    assert len(out) == 1
    assert out[0]["n_values"] == len(values)  # NULL + malformed excluded
    assert out[0]["total_wei"] == str(sum(values))
    # the single-limb path provably loses these rows (NULL above 10^38)
    lossy = df.agg(F.count(u256_to_decimal("value"))).collect()[0][0]
    assert lossy < len(values)


def test_wei_sum_exact_is_single_shuffle(spark):
    """Plan hygiene: the limb split must not add a shuffle — one
    partial-aggregated Exchange on the key, like a plain groupBy-sum."""
    from rust_evm_indexer_spark.operators.evm_analytics import wei_sum_exact

    df = spark.createDataFrame(
        [(f"0x{i % 5:02x}", str(10**40 + i)) for i in range(100)],
        "from_address: string, value: string",
    )
    plan = (
        wei_sum_exact(df, "from_address")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
