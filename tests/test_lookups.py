"""Point-lookup + stats parity (O-21..O-26)."""

from __future__ import annotations

import pytest

from rust_evm_indexer_spark.operators.lookups import (
    get_block,
    get_stats,
    get_transaction,
    latest_block_hash_at,
    read_checkpoint,
)


def test_get_block_by_number(evm, duck):
    want = duck.execute(
        "SELECT * FROM blocks WHERE block_number = 1000005"
    ).df().iloc[0]
    got = get_block(evm["blocks"], "1000005")
    assert got["block_hash"] == want["block_hash"]
    assert got["timestamp"] == want["timestamp"]


def test_get_block_by_hash_case_insensitive(evm, duck):
    bh = duck.execute("SELECT block_hash FROM blocks LIMIT 1").fetchone()[0]
    got = get_block(evm["blocks"], "0x" + bh[2:].upper())
    assert got is not None and got["block_hash"] == bh


def test_get_block_missing_is_none(evm):
    assert get_block(evm["blocks"], "99999999") is None


def test_get_block_invalid_identifier(evm):
    with pytest.raises(ValueError):
        get_block(evm["blocks"], "not-a-number")


def test_get_transaction(evm, duck):
    th = duck.execute("SELECT tx_hash FROM transactions LIMIT 1").fetchone()[0]
    got = get_transaction(evm["transactions"], th.upper().replace("0X", "0x"))
    assert got is not None and got["tx_hash"] == th


def test_get_transaction_validation(evm):
    for bad in ("abc", "0x123", "1" * 66):
        with pytest.raises(ValueError):
            get_transaction(evm["transactions"], bad)


def test_get_transaction_missing(evm):
    assert get_transaction(evm["transactions"], "0x" + "f" * 64) is None


def test_latest_block_hash_at_uncle_height(evm, duck):
    h = duck.execute(
        "SELECT block_number FROM blocks GROUP BY 1 HAVING COUNT(*) > 1"
    ).fetchone()[0]
    got = latest_block_hash_at(evm["blocks"], h)
    assert got in {
        r[0]
        for r in duck.execute(
            f"SELECT block_hash FROM blocks WHERE block_number = {h}"
        ).fetchall()
    }


def test_stats_matches_oracle(evm, duck):
    s = get_stats(
        evm["blocks"], evm["transactions"], evm["logs"], evm["indexer_status"]
    )
    nb, nt, nl = (
        duck.execute(
            "SELECT (SELECT COUNT(*) FROM blocks), (SELECT COUNT(*) FROM transactions),"
            " (SELECT COUNT(*) FROM logs)"
        ).fetchone()
    )
    assert (s.total_blocks, s.total_transactions, s.total_logs) == (nb, nt, nl)
    assert s.ingestion_lag == s.chain_head - s.last_processed_block
    assert s.ingestion_lag > 0


def test_read_checkpoint(evm):
    assert read_checkpoint(evm["indexer_status"]) is not None
