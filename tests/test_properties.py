"""Property-based tests (hypothesis): random GetLogsFilter combinations
must match a pure-Python model of the reference's SQL semantics
(src/api.rs:111-229) evaluated over the collected fixture table."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_evm_indexer_spark.datagen import TRANSFER_SIG, START_BLOCK
from rust_evm_indexer_spark.operators import GetLogsFilter, get_logs


@pytest.fixture(scope="module")
def all_logs(evm):
    rows = [r.asDict() for r in evm["logs"].collect()]
    rows.sort(key=lambda r: (r["block_number"], r["id"]))
    return rows


def model_get_logs(rows: list[dict], flt: GetLogsFilter) -> list[int]:
    """The reference semantics in 20 lines of Python: conjunctive filters
    (hash overrides range), cursor tuple, total order, clamp, limit."""
    out = []
    for r in rows:
        if flt.block_hash is not None:
            if r["block_hash"] != flt.block_hash.lower():
                continue
        else:
            if flt.from_block is not None and r["block_number"] < flt.from_block:
                continue
            if flt.to_block is not None and r["block_number"] > flt.to_block:
                continue
        if flt.address is not None and r["contract_address"] != flt.address.lower():
            continue
        skip = False
        for i, t in enumerate((flt.topic0, flt.topic1, flt.topic2, flt.topic3)):
            if t is not None and r[f"topic{i}"] != t:
                skip = True
        if skip:
            continue
        if flt.has_cursor:
            # src/api.rs:116,165-166 — EITHER field engages cursor mode;
            # the missing one defaults to 0
            cb = flt.cursor_block if flt.cursor_block is not None else 0
            cl = flt.cursor_log_id if flt.cursor_log_id is not None else 0
            if not (
                r["block_number"] > cb
                or (r["block_number"] == cb and r["id"] > cl)
            ):
                continue
        out.append(r["id"])
    size = flt.clamped_page_size()
    if not flt.has_cursor and flt.page is not None:
        out = out[(flt.clamped_page() - 1) * size :]
    return out[:size]


filters = st.builds(
    GetLogsFilter,
    from_block=st.one_of(
        st.none(), st.integers(START_BLOCK - 5, START_BLOCK + 70)
    ),
    to_block=st.one_of(st.none(), st.integers(START_BLOCK - 5, START_BLOCK + 70)),
    topic0=st.one_of(st.none(), st.just(TRANSFER_SIG)),
    cursor_block=st.one_of(st.none(), st.integers(START_BLOCK, START_BLOCK + 60)),
    cursor_log_id=st.one_of(st.none(), st.integers(0, 400)),
    page=st.one_of(st.none(), st.integers(-1, 6)),
    page_size=st.integers(-3, 120),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(flt=filters)
def test_get_logs_matches_python_model(evm, all_logs, flt):
    got = [r["id"] for r in get_logs(evm["logs"], flt).collect()]
    want = model_get_logs(all_logs, flt)
    assert got == want, f"filter={flt}"


@pytest.mark.parametrize(
    "flt",
    [
        # EITHER cursor field alone engages cursor mode (src/api.rs:116):
        # offset `page` must be IGNORED, missing field defaults to 0
        GetLogsFilter(cursor_block=START_BLOCK + 10, page=3, page_size=20),
        GetLogsFilter(cursor_log_id=50, page=2, page_size=20),
    ],
)
def test_single_sided_cursor_engages_cursor_mode(evm, all_logs, flt):
    assert flt.has_cursor
    got = [r["id"] for r in get_logs(evm["logs"], flt).collect()]
    assert got == model_get_logs(all_logs, flt), f"filter={flt}"
