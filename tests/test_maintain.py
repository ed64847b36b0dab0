"""TableStore.maintain — the one-call background-maintenance pass:
compact when fragmented, rebuild stale / refresh fresh projections,
vacuum what's unreferenced.  Queries must be answer-identical before and
after, and the projection must be routable again post-compaction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark.store import TableStore


def _mk_store(spark, tmp_path):
    return TableStore(
        spark, tmp_path / "mstore", bloom_columns={"pts": ("addr",)},
        dict_columns={},
    )


def _commit_batches(spark, store, n_batches, start=0, rows_per=60):
    for b in range(start, start + n_batches):
        rows = [
            (b * 1000 + i, f"0xa{i % 5}", 100 + b) for i in range(rows_per)
        ]
        store.commit(
            {"pts": spark.createDataFrame(
                rows, "id: long, addr: string, block_number: long"
            )}
        )


def test_maintain_compacts_rebuilds_and_vacuums(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 6)
    store.build_projection("pts", "by_addr", ("addr",), max_fragments=2)
    before = sorted(r["id"] for r in store.read("pts").collect())

    report = store.maintain("pts", max_fragments=2)

    assert report["compacted_from"] == 6
    assert report["projections_rebuilt"] == ["by_addr"]
    assert report["vacuumed"] > 0  # pre-compact fragments + old generation
    # base results identical, fragment count bounded
    after = sorted(r["id"] for r in store.read("pts").collect())
    assert after == before
    assert len(store.current_manifest().tables["pts"]) <= 2
    # the projection is fresh and routable again (compaction had removed
    # every covered fragment — unmaintained, read_projection raises)
    proj = store.read_projection("pts", "by_addr", key_equals="0xa2")
    want = store.read("pts").filter(F.col("addr") == "0xa2").count()
    assert proj.filter(F.col("addr") == "0xa2").count() == want


def test_maintain_refreshes_fresh_projection_without_rebuild(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 2)
    store.build_projection("pts", "by_addr", ("addr",), max_fragments=1)
    _commit_batches(spark, store, 1, start=2)  # uncovered delta tail

    report = store.maintain("pts", max_fragments=8)  # under the cap

    assert report["compacted_from"] == 0
    assert report["projections_rebuilt"] == []
    assert report["projections_refreshed"] == ["by_addr"]
    proj = store.read_projection("pts", "by_addr", key_equals="0xa1")
    assert (
        proj.filter(F.col("addr") == "0xa1").count()
        == store.read("pts").filter(F.col("addr") == "0xa1").count()
    )


def test_maintain_noop_when_healthy(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 2)
    v = store.current_manifest().version
    report = store.maintain("pts", max_fragments=8)
    assert report == {
        "compacted_from": 0,
        "projections_rebuilt": [],
        "projections_refreshed": [],
        "vacuumed": 0,
    }
    assert store.current_manifest().version == v  # no manifest churn


@pytest.mark.slow
def test_maintain_with_zorder_layout(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 6)
    before = sorted(r["id"] for r in store.read("pts").collect())
    report = store.maintain(
        "pts", max_fragments=3, zorder_by=("block_number", "addr")
    )
    assert report["compacted_from"] == 6
    after = sorted(r["id"] for r in store.read("pts").collect())
    assert after == before


# --- batched fragment maintenance (r7: two jobs total, not two/frag) -------


def test_batched_delete_edge_cases(spark, tmp_path):
    """One delete over many fragments must: drop matching rows from
    every hit fragment, EMPTY a fragment whose rows all match (no
    zero-row fragment lands in the manifest), keep NULL-key rows (the
    NULL-safe survivor filter), and keep clean fragments by reference
    with their non-derived changefeed status intact."""
    store = TableStore(spark, tmp_path / "bstore", bloom_columns={},
                       dict_columns={})
    schema = "id: long, addr: string, block_number: long"
    # frag A: mixed (2 of 4 match), frag B: all match (emptied),
    # frag C: clean, frag D: holds a NULL key
    store.commit({"pts": spark.createDataFrame(
        [(1, "0xAA", 1), (2, "0xbb", 1), (3, "0xaa", 1), (4, "0xcc", 1)],
        schema)})
    store.commit({"pts": spark.createDataFrame(
        [(5, "0xaa", 2), (6, "0xAA", 2)], schema)})
    store.commit({"pts": spark.createDataFrame(
        [(7, "0xdd", 3)], schema)})
    store.commit({"pts": spark.createDataFrame(
        [(8, None, 4), (9, "0xee", 4)], schema)})
    before_paths = {f.path: f.derived
                    for f in store.current_manifest().tables["pts"]}

    stats = store.delete_equals("pts", "addr", "0xAA")  # case-insensitive

    assert stats["candidates"] == 4  # no blooms: every fragment scanned
    assert stats["rewritten"] == 2   # A rewritten, B emptied
    assert stats["deleted_rows"] == 4
    left = {(r["id"], r["addr"]) for r in store.read("pts").collect()}
    assert left == {(2, "0xbb"), (4, "0xcc"), (7, "0xdd"),
                    (8, None), (9, "0xee")}
    after = store.current_manifest().tables["pts"]
    assert all(f.rows > 0 for f in after)  # emptied fragment gone
    # clean fragments kept by REFERENCE (same path, still non-derived)
    kept_untouched = [f for f in after if f.path in before_paths]
    assert len(kept_untouched) == 2 and all(
        not f.derived for f in kept_untouched)
    # rewritten survivor fragment is derived (changefeed skips it)
    assert all(f.derived for f in after if f.path not in before_paths)


def test_batched_upsert_across_evolved_schemas(spark, tmp_path):
    """Upsert keys spread over fragments written BEFORE and AFTER a
    schema evolution: the batched rewrite reads under the manifest
    schema, so pre-evolution survivors materialize the new column as
    NULL — exactly what read() already presented."""
    store = TableStore(spark, tmp_path / "estore", bloom_columns={},
                       dict_columns={})
    store.commit({"docs": spark.createDataFrame(
        [(1, "old-1"), (2, "old-2")], "doc_id: long, text: string")})
    store.commit({"docs": spark.createDataFrame(
        [(3, "old-3", 0.5)], "doc_id: long, text: string, score: double")})

    batch = spark.createDataFrame(
        [(2, "new-2", 0.9), (3, "new-3", 0.7), (4, "new-4", 0.1)],
        "doc_id: long, text: string, score: double")
    stats = store.upsert("docs", batch, "doc_id")

    assert stats["rewritten"] == 2 and stats["replaced_rows"] == 2
    assert stats["inserted_rows"] == 3
    got = {r["doc_id"]: (r["text"], r["score"])
           for r in store.read("docs").collect()}
    assert got == {1: ("old-1", None), 2: ("new-2", 0.9),
                   3: ("new-3", 0.7), 4: ("new-4", 0.1)}


def test_delete_in_batched_takedown(spark, tmp_path):
    """delete_in: one atomic version for a whole takedown list, exact
    changefeed replay of the batch from the recorded key set, NULL keys
    untouched, case-insensitive string matching."""
    store = TableStore(spark, tmp_path / "dstore", bloom_columns={},
                       dict_columns={})
    schema = "id: long, addr: string, block_number: long"
    store.commit({"pts": spark.createDataFrame(
        [(1, "0xAA", 1), (2, "0xbb", 1), (3, None, 1)], schema)})
    store.commit({"pts": spark.createDataFrame(
        [(4, "0xaa", 2), (5, "0xcc", 2), (6, "0xdd", 2)], schema)})
    pre = store.current_manifest().version

    stats = store.delete_in("pts", "addr", ["0xaa", "0xCC"])

    assert store.current_manifest().version == pre + 1  # ONE version
    assert stats["deleted_rows"] == 3 and stats["rewritten"] == 2
    left = {r["id"] for r in store.read("pts").collect()}
    assert left == {2, 3, 6}  # NULL key survives
    feed = store.changes("pts", since_version=pre, include_deletes=True)
    deleted = sorted(r["id"] for r in feed.collect()
                     if r["_change_type"] == "delete")
    assert deleted == [1, 4, 5]

    # empty list and oversized list contracts
    assert store.delete_in("pts", "addr", [])["rewritten"] == 0
    assert store.current_manifest().version == pre + 1
    with pytest.raises(ValueError, match="max_keys"):
        store.delete_in("pts", "addr", list(map(str, range(20))), max_keys=10)


def test_delete_in_purges_projections(spark, tmp_path):
    store = TableStore(spark, tmp_path / "pstore", bloom_columns={},
                       dict_columns={})
    schema = "id: long, addr: string, block_number: long"
    store.commit({"pts": spark.createDataFrame(
        [(i, f"0x{i % 7:02x}", i) for i in range(70)], schema)})
    store.build_projection("pts", "by_addr", ("addr",), max_fragments=2)

    stats = store.delete_in("pts", "addr", ["0x01", "0x03"])

    assert stats["deleted_rows"] == 20
    assert stats["projection_fragments_rewritten"] >= 1
    via = store.read_projection("pts", "by_addr")
    assert via.count() == 50
    assert via.filter(F.col("addr").isin("0x01", "0x03")).count() == 0


# -- stats()-driven whole-store policy pass (VERDICT r7 item 6) ----------

from rust_evm_indexer_spark.store import MaintenancePolicy  # noqa: E402


@pytest.mark.slow
def test_maintain_store_compacts_by_count_and_is_idempotent(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 6)
    before = sorted(r["id"] for r in store.read("pts").collect())

    pol = MaintenancePolicy(max_fragments=2)
    rep = store.maintain_store(pol)
    assert rep["tables"]["pts"]["compacted_from"] == 6
    assert any("fragments 6 > 2" in r for r in rep["triggers"]["pts"])
    assert rep["vacuumed"] > 0
    assert sorted(r["id"] for r in store.read("pts").collect()) == before
    assert store.stats()["tables"]["pts"]["fragments"] <= 2

    # second pass on the unchanged store: every trigger re-derives from
    # stats(), so nothing fires and nothing is vacuumed
    rep2 = store.maintain_store(pol)
    assert rep2["triggers"] == {}
    assert rep2["tables"]["pts"]["compacted_from"] == 0
    assert rep2["vacuumed"] == 0


def test_maintain_store_compacts_by_size_skew(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    # one big base fragment + two tiny tails: count is fine, skew is not
    _commit_batches(spark, store, 1, rows_per=40000)
    _commit_batches(spark, store, 2, start=1, rows_per=10)
    st = store.stats()["tables"]["pts"]
    assert st["fragments"] == 3
    assert st["size_skew"] is not None and st["size_skew"] > 4.0

    pol = MaintenancePolicy(max_fragments=8, max_size_skew=4.0)
    rep = store.maintain_store(pol)
    assert rep["tables"]["pts"]["compacted_from"] == 3
    assert any("size_skew" in r for r in rep["triggers"]["pts"])
    # block-skewed data: repartitionByRange balances by block range, not
    # bytes, so a single rewrite may leave residual skew — the pass must
    # REPORT it honestly (ADVICE r8) and converge by fragment-count
    # descent (strictly decreasing per pass, skew undefined at 1), with
    # correctness invariant throughout
    rows_before = store.read("pts").count()
    passes = 0
    while True:
        st = store.stats()["tables"]["pts"]
        if st["size_skew"] is None or st["size_skew"] <= 4.0:
            break
        frags_before = st["fragments"]
        rep = store.maintain_store(pol)
        assert any("size_skew" in r for r in rep["triggers"]["pts"])
        if "residual_skew" in rep["tables"]["pts"]:
            assert any("residual_skew" in r for r in rep["triggers"]["pts"])
        assert store.stats()["tables"]["pts"]["fragments"] < frags_before
        passes += 1
        assert passes <= frags_before  # the documented convergence bound
    assert store.read("pts").count() == rows_before
    # converged: the next pass is a no-op
    assert store.maintain_store(pol)["triggers"] == {}


@pytest.mark.slow
def test_maintain_store_refresh_gated_on_projection_lag(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 2)
    store.build_projection("pts", "by_addr", ("addr",), max_fragments=1)
    _commit_batches(spark, store, 2, start=2)  # lag 2 < threshold 3

    pol = MaintenancePolicy(max_fragments=16, max_projection_lag=3)
    rep = store.maintain_store(pol)
    assert rep["tables"]["pts"]["projections_refreshed"] == []
    assert store.stats()["tables"]["pts"]["projections"]["by_addr"][
        "lag_fragments"] == 2

    _commit_batches(spark, store, 2, start=4)  # lag 4 > threshold 3
    rep = store.maintain_store(pol)
    assert rep["tables"]["pts"]["projections_refreshed"] == ["by_addr"]
    assert store.stats()["tables"]["pts"]["projections"]["by_addr"][
        "lag_fragments"] == 0
    # answers still identical to the base table through the projection
    want = store.read("pts").filter(F.col("addr") == "0xa1").count()
    got = store.read_projection("pts", "by_addr", key_equals="0xa1").filter(
        F.col("addr") == "0xa1").count()
    assert got == want


# -- property: maintain_store is safe under ANY op interleaving ----------

import tempfile
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

# op encoding: ("commit", rows) | ("delete", addr_mod) | ("maintain",)
_store_ops = hs.lists(
    hs.one_of(
        hs.tuples(hs.just("commit"), hs.integers(20, 80)),
        hs.tuples(hs.just("delete"), hs.integers(0, 4)),
        hs.tuples(hs.just("maintain")),
    ),
    min_size=3,
    max_size=7,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=_store_ops)
def test_maintain_store_safe_under_random_op_interleavings(spark, ops):
    """For ANY interleaving of commits, per-address deletes and
    maintain_store passes: visible rows always equal the python-side
    model (maintenance is answer-invariant), a maintain pass leaves
    fragments at/below the policy cap, and an immediately repeated pass
    fires nothing (idempotency holds from EVERY reachable state, not
    just the soak's schedule)."""
    root = Path(tempfile.mkdtemp(prefix="maint-prop-"))
    store = TableStore(spark, root / "s", bloom_columns={}, dict_columns={})
    from rust_evm_indexer_spark.store import MaintenancePolicy

    pol = MaintenancePolicy(max_fragments=3, max_size_skew=64.0)
    model: dict[int, str] = {}
    next_id = 0
    block = 0
    for op in ops:
        if op[0] == "commit":
            rows = [(next_id + i, f"0xa{(next_id + i) % 5}", block)
                    for i in range(op[1])]
            store.commit({"pts": spark.createDataFrame(
                rows, "id: long, addr: string, block_number: long")})
            model.update({r[0]: r[1] for r in rows})
            next_id += op[1]
            block += 1
        elif op[0] == "delete":
            addr = f"0xa{op[1]}"
            store.delete_equals("pts", "addr", addr)
            model = {i: a for i, a in model.items() if a != addr}
        else:
            store.maintain_store(pol)
            st = store.stats()["tables"].get("pts")
            if st:
                assert st["fragments"] <= pol.max_fragments
            rep2 = store.maintain_store(pol)
            assert rep2["triggers"] == {}
            assert rep2["vacuumed"] == 0
        if "pts" in store.current_manifest().tables:
            got = {r["id"]: r["addr"] for r in store.read("pts").collect()}
            assert got == model
    # final pass from whatever state the sequence left behind
    store.maintain_store(pol)
    if "pts" in store.current_manifest().tables:
        got = {r["id"]: r["addr"] for r in store.read("pts").collect()}
        assert got == model


def test_stats_bytes_are_manifest_only(spark, tmp_path, monkeypatch):
    """r9: fragment byte sizes are recorded in the manifest at write
    time, so stats()/the skew trigger cost ZERO filesystem I/O — at
    millions of fragments a per-pass stat walk would dominate the
    maintenance loop.  Pinned by making any rglob a loud failure."""
    import pathlib

    store = _mk_store(spark, tmp_path)
    _commit_batches(spark, store, 3)
    m = store.current_manifest()
    frags = m.tables["pts"]
    assert all(f.bytes and f.bytes > 0 for f in frags)

    def _no_fs_walk(self, *a, **k):
        raise AssertionError("stats() walked the filesystem for bytes")

    monkeypatch.setattr(pathlib.Path, "rglob", _no_fs_walk)
    st = store.stats()["tables"]["pts"]
    assert st["bytes"] == sum(f.bytes for f in frags)
    assert st["size_skew"] is not None
    assert store._table_size_skew("pts") == st["size_skew"]
    # pre-r9 manifests (no recorded bytes) still degrade to the walk
    monkeypatch.undo()
    frags[0].bytes = None
    assert store._frag_bytes(frags[0]) > 0
