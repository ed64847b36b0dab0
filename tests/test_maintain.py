"""TableStore.maintain — the one-call background-maintenance pass:
compact when fragmented, rebuild stale / refresh fresh projections,
vacuum what's unreferenced.  Queries must be answer-identical before and
after, and the projection must be routable again post-compaction."""

from __future__ import annotations

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
