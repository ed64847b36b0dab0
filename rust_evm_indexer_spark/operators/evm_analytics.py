"""EVM analytics built on the ABI-decode primitive — the aggregation
surface the reference's string-typed storage could never serve
(SURVEY.md §1.3: "any SUM/AVG over wei is out of the reference's scope").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.evm import hex_to_u256_decimal, u256_to_decimal

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


def value_flow_by_block(transactions: DataFrame) -> DataFrame:
    """Per-block native-ETH flow from the U256 value strings."""
    return transactions.groupBy("block_number").agg(
        F.count("*").alias("n_txs"),
        F.sum(u256_to_decimal("value")).cast("decimal(38,0)").alias("wei_moved"),
    )
