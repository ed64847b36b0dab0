"""EVM analytics built on the ABI-decode primitive — the aggregation
surface the reference's string-typed storage could never serve
(SURVEY.md §1.3: "any SUM/AVG over wei is out of the reference's scope").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.evm import (
    hex_to_u256_decimal,
    u256_limbs,
    u256_string_from_limb_sums,
    u256_to_decimal,
)

#: keccak256("Transfer(address,address,uint256)") — the ERC-20 signature
TRANSFER_TOPIC0 = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def transfer_volume_by_contract(
    logs: DataFrame, transfer_sig: str = TRANSFER_TOPIC0
) -> DataFrame:
    """Per-token Transfer volume: filter on topic0 (scan-pushed), decode
    the uint256 amount from ``data``, exact decimal sum."""
    return (
        logs.where(F.col("topic0") == transfer_sig)
        .groupBy("contract_address")
        .agg(
            F.count("*").alias("n_transfers"),
            F.sum(hex_to_u256_decimal("data"))
            .cast("decimal(38,0)")
            .alias("volume"),
        )
    )


def wei_sum_exact(
    df: DataFrame, key: str, value_col: str = "value"
) -> DataFrame:
    """LOSSLESS per-key U256 sum — the full-range variant of
    :func:`value_flow_by_block`'s single-limb DECIMAL(38,0) contract
    (which drops values ≥ 10^38 as NULL, documented in SURVEY.md §1.3).

    Shape: one partial-aggregated shuffle on ``key``, identical to a
    plain groupBy-sum — the limb split is 4 codegen'd string slices per
    row, the carry recombination runs on the tiny aggregated frame.
    Output ``total_wei`` is the exact decimal digit string at any
    magnitude (a U256 total doesn't fit ANY Spark numeric type);
    ``n_values`` counts the non-NULL, well-formed inputs that
    contributed."""
    l0, l1, l2, l3 = u256_limbs(value_col)
    limbed = df.select(F.col(key), l0, l1, l2, l3)
    agg = limbed.groupBy(key).agg(
        F.count("_u256_l0").alias("n_values"),
        F.sum("_u256_l0").alias("_s0"),
        F.sum("_u256_l1").alias("_s1"),
        F.sum("_u256_l2").alias("_s2"),
        F.sum("_u256_l3").alias("_s3"),
    )
    return agg.select(
        key,
        "n_values",
        u256_string_from_limb_sums(
            F.col("_s0"), F.col("_s1"), F.col("_s2"), F.col("_s3")
        ).alias("total_wei"),
    )


def value_flow_by_block(transactions: DataFrame) -> DataFrame:
    """Per-block native-ETH flow from the U256 value strings."""
    return transactions.groupBy("block_number").agg(
        F.count("*").alias("n_txs"),
        F.sum(u256_to_decimal("value")).cast("decimal(38,0)").alias("wei_moved"),
    )
