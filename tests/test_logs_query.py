"""Flagship get_logs parity + cursor-pagination property tests
(SURVEY.md §5.2-5.3)."""

from __future__ import annotations

import pytest

from rust_evm_indexer_spark.datagen import TRANSFER_SIG
from rust_evm_indexer_spark.operators import GetLogsFilter, get_logs, run_get_logs

from compare import assert_matches_sql

PROJ = (
    "SELECT id, log_index_in_tx AS log_index, transaction_hash, "
    "transaction_index_in_block AS transaction_index, block_number, block_hash, "
    "contract_address AS address, data, topic0, topic1, topic2, topic3 FROM logs"
)
ORDER = "ORDER BY block_number ASC, id ASC"


def first_vals(duck):
    row = duck.execute(
        "SELECT block_hash, contract_address, topic1 FROM logs "
        "WHERE topic1 IS NOT NULL LIMIT 1"
    ).fetchone()
    return {"block_hash": row[0], "address": row[1], "topic1": row[2]}


def test_no_filter_first_page(evm, duck):
    df = get_logs(evm["logs"], GetLogsFilter(page_size=25))
    assert_matches_sql(df, duck, f"{PROJ} {ORDER} LIMIT 25", "first page")


def test_topic0_filter(evm, duck):
    df = get_logs(evm["logs"], GetLogsFilter(topic0=TRANSFER_SIG, page_size=100))
    assert_matches_sql(
        df, duck, f"{PROJ} WHERE topic0 = '{TRANSFER_SIG}' {ORDER} LIMIT 100"
    )


def test_address_filter_case_insensitive(evm, duck):
    addr = first_vals(duck)["address"]
    df = get_logs(evm["logs"], GetLogsFilter(address=addr.upper().replace("0X", "0x"), page_size=100))
    assert_matches_sql(
        df, duck,
        f"{PROJ} WHERE lower(contract_address) = lower('{addr}') {ORDER} LIMIT 100",
    )


def test_block_range(evm, duck):
    df = get_logs(
        evm["logs"], GetLogsFilter(from_block=1_000_010, to_block=1_000_030, page_size=100)
    )
    assert_matches_sql(
        df, duck,
        f"{PROJ} WHERE block_number >= 1000010 AND block_number <= 1000030 {ORDER} LIMIT 100",
    )


def test_block_hash_overrides_range(evm, duck):
    """O-14a: when block_hash is set, from/to are ignored (src/api.rs:126-139)."""
    bh = first_vals(duck)["block_hash"]
    flt = GetLogsFilter(block_hash=bh, from_block=1, to_block=2, page_size=100)
    df = get_logs(evm["logs"], flt)
    assert_matches_sql(
        df, duck, f"{PROJ} WHERE block_hash = '{bh}' {ORDER} LIMIT 100"
    )
    assert df.count() > 0  # range (1,2) matches nothing → proves it was ignored


def test_combined_topic_and_range(evm, duck):
    t1 = first_vals(duck)["topic1"]
    flt = GetLogsFilter(topic0=TRANSFER_SIG, topic1=t1, from_block=1_000_000, page_size=100)
    df = get_logs(evm["logs"], flt)
    assert_matches_sql(
        df, duck,
        f"{PROJ} WHERE block_number >= 1000000 AND topic0 = '{TRANSFER_SIG}' "
        f"AND topic1 = '{t1}' {ORDER} LIMIT 100",
    )


def test_offset_pagination(evm, duck):
    flt = GetLogsFilter(page=3, page_size=10)
    df = get_logs(evm["logs"], flt)
    assert_matches_sql(df, duck, f"{PROJ} {ORDER} LIMIT 10 OFFSET 20", "page 3")


def test_page_size_clamped(evm):
    assert get_logs(evm["logs"], GetLogsFilter(page_size=1000)).count() == 100
    assert get_logs(evm["logs"], GetLogsFilter(page_size=-5)).count() == 1


@pytest.mark.slow
@pytest.mark.parametrize("page_size,to_block", [(1, 1_000_010), (7, None), (100, None)])
def test_cursor_walk_no_dup_no_skip(evm, duck, page_size, to_block):
    """Property (README.md:86): walking the table by keyset cursor yields
    exactly the ORDER BY sequence — no duplicates, no skips.  (page_size=1
    walks a sub-range only, to bound the number of Spark jobs.)"""
    where = f"WHERE block_number <= {to_block}" if to_block else ""
    expected = [
        r[0] for r in duck.execute(f"SELECT id FROM logs {where} {ORDER}").fetchall()
    ]
    seen: list[int] = []
    flt = GetLogsFilter(page_size=page_size, to_block=to_block)
    for _ in range(len(expected) // max(1, page_size) + 2):
        page = run_get_logs(evm["logs"], flt)
        if not page.logs:
            break
        seen.extend(r["id"] for r in page.logs)
        flt = GetLogsFilter(
            page_size=page_size,
            to_block=to_block,
            cursor_block=page.next_cursor_block,
            cursor_log_id=page.next_cursor_log_id,
        )
    assert seen == expected


def test_next_cursor_is_last_row(evm):
    page = run_get_logs(evm["logs"], GetLogsFilter(page_size=10))
    assert page.next_cursor_block == page.logs[-1]["block_number"]
    assert page.next_cursor_log_id == page.logs[-1]["id"]


def test_empty_result_has_null_cursor(evm):
    page = run_get_logs(evm["logs"], GetLogsFilter(from_block=9_999_999))
    assert page.logs == [] and page.next_cursor_block is None
