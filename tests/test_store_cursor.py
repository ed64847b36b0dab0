"""Store-routed keyset pagination (VERDICT r7 item 7): the cursor's
tuple predicate must reach BOTH pruning tiers — manifest min/max at the
fragment level (fragments the cursor walked past are never listed) and
PushedFilters at the parquet scan — while staying answer-identical to
the raw-table page plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators import (
    GetLogsFilter,
    get_logs,
    get_logs_from_store,
)
from rust_evm_indexer_spark.store import TableStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """8 block-range fragments of a logs-shaped table, 10 blocks each."""
    root = tmp_path_factory.mktemp("cursor_store")
    st = TableStore(spark, root / "store", dict_columns={"logs": ("topic0",)})
    rid = 0
    for b in range(8):
        rows = []
        for blk in range(b * 10, (b + 1) * 10):
            for j in range(3):
                rows.append((
                    rid, j, f"0xtx{rid:04d}", j, blk, f"0xbh{blk:04d}",
                    f"0xaddr{rid % 4}", "0x",
                    f"0xsig{j}", None, None, None,
                ))
                rid += 1
        st.commit({"logs": spark.createDataFrame(
            rows,
            "id: long, log_index_in_tx: long, transaction_hash: string, "
            "transaction_index_in_block: long, block_number: long, "
            "block_hash: string, contract_address: string, data: string, "
            "topic0: string, topic1: string, topic2: string, topic3: string",
        )})
    return st


def test_cursor_prunes_fragments_at_manifest_tier(store):
    flt = GetLogsFilter(cursor_block=55, cursor_log_id=2, page_size=100)
    page = get_logs_from_store(store, flt)
    full = store.read("logs")
    # blocks 0-49 live in fragments the cursor already walked past —
    # 5 of 8 fragments must never be listed
    assert len(page.inputFiles()) <= len(full.inputFiles()) * 3 // 8
    # and the TUPLE predicate (not just the bound) reaches the scan
    plan = page._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(block_number,55)" in plan
    assert "GreaterThan(id,2)" in plan


def test_cursor_page_identical_to_raw_table_plan(store):
    flt = GetLogsFilter(cursor_block=55, cursor_log_id=2, page_size=100)
    routed = get_logs_from_store(store, flt).collect()
    raw = get_logs(store.read("logs"), flt).collect()
    assert routed == raw
    # strictness: the cursor row itself is excluded, its successor first
    assert routed[0]["block_number"] >= 55
    ids = [(r["block_number"], r["id"]) for r in routed]
    assert ids == sorted(ids)
    assert all(t > (55, 2) for t in ids)


def test_cursor_bound_composes_with_explicit_range(store):
    # from_block BELOW the cursor must not widen the prune window, and
    # to_block still bounds above
    flt = GetLogsFilter(from_block=10, to_block=64,
                        cursor_block=55, cursor_log_id=2, page_size=100)
    page = get_logs_from_store(store, flt)
    full = store.read("logs")
    assert len(page.inputFiles()) <= len(full.inputFiles()) * 2 // 8
    rows = page.collect()
    assert {r["block_number"] for r in rows} <= set(range(55, 65))
    want = get_logs(store.read("logs"), flt).collect()
    assert rows == want


def test_cursor_does_not_leak_into_blockhash_override(store):
    # O-14a: block_hash overrides the range; the cursor bound must not
    # prune away the hash's fragment (hash precedes the cursor here)
    flt = GetLogsFilter(block_hash="0xbh0012", cursor_block=55,
                        cursor_log_id=0, page_size=100)
    rows = get_logs_from_store(store, flt).collect()
    # tuple predicate still applies (reference ANDs it), but the HASH
    # range is what's scanned: same answer as the raw-table plan
    want = get_logs(store.read("logs"), flt).collect()
    assert rows == want


def test_cursor_routes_through_address_projection(store, spark):
    store.build_projection("logs", "by_addr", ("contract_address",),
                           max_fragments=2)
    flt = GetLogsFilter(address="0xaddr1", cursor_block=55,
                        cursor_log_id=2, page_size=100)
    routed = get_logs_from_store(store, flt).collect()
    want = get_logs(store.read("logs"), flt).collect()
    assert routed == want and len(routed) > 0
    assert all(r["address"] == "0xaddr1" for r in routed)


def test_cursor_walk_is_stable_under_concurrent_ingest(spark, tmp_path):
    """The keyset contract under a GROWING table (the reference's
    cursor exists exactly for this — src/api.rs:165-174): walking pages
    by cursor while ingest commits land between pages must (a) never
    duplicate a row, (b) never skip a row that existed when the walk
    started, because the cursor is a total-order position, not an
    offset.  Offset pagination cannot make this promise — each commit
    shifts every later offset."""
    st = TableStore(spark, tmp_path / "grow_store", dict_columns={})
    rid = 0

    def batch(n_blocks, start_blk):
        nonlocal rid
        rows = []
        for blk in range(start_blk, start_blk + n_blocks):
            for j in range(4):
                rows.append((
                    rid, j, f"0xtx{rid:04d}", j, blk, f"0xbh{blk:04d}",
                    "0xaddr", "0x", "0xsig", None, None, None,
                ))
                rid += 1
        st.commit({"logs": spark.createDataFrame(
            rows,
            "id: long, log_index_in_tx: long, transaction_hash: string, "
            "transaction_index_in_block: long, block_number: long, "
            "block_hash: string, contract_address: string, data: string, "
            "topic0: string, topic1: string, topic2: string, topic3: string",
        )})

    batch(10, 0)
    walk_start_rows = {(r["block_number"], r["id"])
                       for r in st.read("logs").collect()}

    seen = []
    cursor = (None, None)
    for page_no in range(10):
        flt = GetLogsFilter(page_size=9, cursor_block=cursor[0],
                            cursor_log_id=cursor[1])
        if cursor == (None, None):
            flt = GetLogsFilter(page_size=9, cursor_block=0,
                                cursor_log_id=-1)
        rows = get_logs_from_store(st, flt).collect()
        if not rows:
            break
        seen.extend((r["block_number"], r["id"]) for r in rows)
        cursor = (rows[-1]["block_number"], rows[-1]["id"])
        # ingest lands between every page read
        batch(2, 10 + 2 * page_no)

    assert len(seen) == len(set(seen))          # (a) no duplicates
    assert walk_start_rows <= set(seen)         # (b) nothing skipped
    assert seen == sorted(seen)                 # total order held


def test_cursor_fragment_pruning_at_fragment_scale(spark, tmp_path):
    """VERDICT r8 stretch: the O-16 claim demonstrated AT FRAGMENT
    SCALE.  240 single-block fragments (the raw streaming-tail shape,
    compaction off), three history sizes as manifest versions — the
    fragment count LISTED for a page whose cursor sits 40 blocks from
    the tip must stay FLAT (= 40) as total history grows 60 -> 240:
    deep pagination costs O(fragments at the cursor), never O(history
    walked past).  Fragments are fabricated pyarrow-side (this measures
    the READ path's metadata pruning; the commit path has its own
    suites), and the routed page stays answer-identical to the raw
    plan on the full store."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_evm_indexer_spark.store.table_store import Fragment, Manifest

    st = TableStore(spark, tmp_path / "deep_store", dict_columns={},
                    bloom_columns={})
    schema = pa.schema([
        ("id", pa.int64()), ("log_index_in_tx", pa.int64()),
        ("transaction_hash", pa.string()),
        ("transaction_index_in_block", pa.int64()),
        ("block_number", pa.int64()), ("block_hash", pa.string()),
        ("contract_address", pa.string()), ("data", pa.string()),
        ("topic0", pa.string()), ("topic1", pa.string()),
        ("topic2", pa.string()), ("topic3", pa.string()),
    ])
    frags: list[Fragment] = []
    version = 0
    for blk in range(240):
        rel = f"data/logs/frag-{blk:05d}"
        fdir = st.root / rel
        fdir.mkdir(parents=True)
        rows = [
            {
                "id": blk * 2 + j, "log_index_in_tx": j,
                "transaction_hash": f"0xtx{blk:04d}",
                "transaction_index_in_block": j, "block_number": blk,
                "block_hash": f"0xbh{blk:04d}",
                "contract_address": f"0xaddr{blk % 4}", "data": "0x",
                "topic0": f"0xsig{j}", "topic1": None, "topic2": None,
                "topic3": None,
            }
            for j in range(2)
        ]
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       fdir / "part-0.parquet")
        frags.append(Fragment(path=rel, rows=2, min_block=blk,
                              max_block=blk))
        if blk + 1 in (60, 120, 240):
            version += 1
            st._swap(Manifest(version=version,
                              tables={"logs": list(frags)}))
    # the measured curve: listed fragments at (tip - 40) per history size
    listed = {}
    for version, total in ((1, 60), (2, 120), (3, 240)):
        m = st.manifest_at(version)
        cursor = total - 40
        survivors = st.fragments_for("logs", min_block=cursor, manifest=m)
        listed[total] = len(survivors)
        assert all(f.max_block >= cursor for f in survivors)
    # flat in history: 4x the fragments, identical listing cost
    assert listed == {60: 40, 120: 40, 240: 40}, listed
    # and through the real routed page on the full store: Spark lists
    # exactly the at-cursor fragment files, and the answer matches the
    # raw-table plan
    flt = GetLogsFilter(cursor_block=200, cursor_log_id=0, page_size=50)
    page = get_logs_from_store(st, flt)
    assert len(page.inputFiles()) == 40
    assert page.collect() == get_logs(st.read("logs"), flt).collect()
