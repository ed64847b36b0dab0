"""Incremental corpus dedup: only the delta pays compute, the survivor
corpus + its MinHash band index accumulate in one atomic commit per
round, and cross-round duplicates are exact-Jaccard verified."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators.incremental_dedup import (
    IncrementalDeduper,
    banded_minhash,
)
from rust_evm_indexer_spark.store import TableStore

_SENT = "the quick brown fox jumps over the lazy dog near the river bank"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )


def _mk(spark, tmp_path):
    store = TableStore(spark, tmp_path / "inc", bloom_columns={}, dict_columns={})
    # 16×2 banding keeps CI fast (the 64-agg codegen dominates tiny
    # batches); recall at the J≥0.5 dups planted here is still ≈1
    return IncrementalDeduper(store, threshold=0.5, n_perm=16, bands=8), store


def test_first_batch_dedups_within_and_seeds_state(spark, tmp_path):
    dd, store = _mk(spark, tmp_path)
    rep = dd.add_batch(
        _docs(spark, [(1, _SENT), (2, _SENT), (3, "completely different text "
                                                  "about spark engines and joins")])
    )
    assert rep == {"batch": 3, "within_kept": 2, "cross_dropped": 0, "added": 2}
    assert sorted(r["doc_id"] for r in dd.corpus().collect()) == [1, 3]
    # the band index covers exactly the survivors
    idx_ids = {r["doc_id"] for r in store.read("minhash_bands").collect()}
    assert idx_ids == {1, 3}


@pytest.mark.slow
def test_cross_round_duplicate_dropped_fresh_added(spark, tmp_path):
    dd, _ = _mk(spark, tmp_path)
    dd.add_batch(_docs(spark, [(1, _SENT)]))
    rep = dd.add_batch(
        _docs(spark, [
            (10, _SENT),  # exact dup of round-1 doc 1
            (11, _SENT + " with a tiny tail change"),  # near-dup of 10 AND 1
            (12, "entirely novel content on columnar storage formats and "
                 "fragment pruning strategies for large tables"),
        ])
    )
    # 10 and 11 are near-dups of EACH OTHER, so within-batch dedup keeps
    # only 10; the cross-round pass then drops 10 against stored doc 1
    assert rep["within_kept"] == 2
    assert rep["cross_dropped"] == 1
    assert rep["added"] == 1
    assert sorted(r["doc_id"] for r in dd.corpus().collect()) == [1, 12]


@pytest.mark.slow
def test_rounds_accumulate_and_state_matches_corpus(spark, tmp_path):
    dd, store = _mk(spark, tmp_path)
    texts = [
        "alpha " * 8 + "document one of the corpus with stable words",
        "beta " * 8 + "document two about completely other matters entirely",
        "gamma " * 8 + "third text independent of the first two documents",
    ]
    dd.add_batch(_docs(spark, [(i, t) for i, t in enumerate(texts)]))
    dd.add_batch(_docs(spark, [(100, texts[1]), (101, "fresh fourth corpus "
                               "entry with novel content and wording")]))
    ids = sorted(r["doc_id"] for r in dd.corpus().collect())
    assert ids == [0, 1, 2, 101]
    idx_ids = sorted({r["doc_id"] for r in store.read("minhash_bands").collect()})
    assert idx_ids == ids  # index and corpus committed atomically, never diverge


def test_banded_minhash_exact_dup_collides_everywhere(spark, tmp_path):
    df = _docs(spark, [(1, _SENT), (2, _SENT)])
    b = banded_minhash(df, bands=32)
    collisions = (
        b.alias("a").join(b.alias("b"), ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .count()
    )
    assert collisions == 32  # identical text → every band collides


@pytest.mark.slow
def test_changefeed_delivers_exactly_each_rounds_survivors(spark, tmp_path):
    """The delta pipeline contract (examples/demo_delta_pipeline.py):
    after every add_batch, the changefeed window since the last consumed
    version contains EXACTLY that round's admitted survivors — so a
    downstream consumer (BPE vocab refresh, index builder) only ever
    pays for the delta.  A takedown then propagates through the delete
    feed with exactly the removed rows."""
    dd, store = _mk(spark, tmp_path)
    batches = [
        [(1, _SENT), (2, "novel text about columnar formats and stores")],
        [(10, _SENT),  # cross-round dup: dropped, must NOT reach downstream
         (11, "fresh words on morton tiles and pruning strategies")],
        [(20, "third round content regarding broadcast joins in spark")],
    ]
    consumed = 0
    for rows in batches:
        rep = dd.add_batch(_docs(spark, rows))
        now = store.current_manifest().version
        delta = store.changes(dd.corpus_table, since_version=consumed, to_version=now)
        consumed = now
        got = sorted(r["doc_id"] for r in delta.collect())
        assert len(got) == rep["added"]
    # cumulative: feed from genesis equals the corpus
    all_ids = sorted(
        r["doc_id"]
        for r in store.changes(dd.corpus_table, since_version=0).collect()
    )
    assert all_ids == sorted(r["doc_id"] for r in dd.corpus().collect())
    assert 10 not in all_ids  # the dropped dup never reached downstream

    # takedown: the delete feed carries exactly the removed row
    pre = store.current_manifest().version
    store.delete_equals(dd.corpus_table, "doc_id", 1)
    feed = store.changes(
        dd.corpus_table, since_version=pre, include_deletes=True
    ).collect()
    assert [r["doc_id"] for r in feed if r["_change_type"] == "delete"] == [1]


# --- winnow signature scheme (r7): same machinery, structural recall -------


def _mk_winnow(spark, tmp_path):
    store = TableStore(spark, tmp_path / "incw", bloom_columns={},
                       dict_columns={})
    return IncrementalDeduper(
        store, threshold=0.5, method="winnow", k=3, window=4,
        bands_table="winnow_fps",
    ), store


@pytest.mark.slow
def test_winnow_method_first_batch_and_cross_round(spark, tmp_path):
    dd, store = _mk_winnow(spark, tmp_path)
    rep = dd.add_batch(
        _docs(spark, [(1, _SENT), (2, _SENT),
                      (3, "completely different text about spark engines "
                          "and broadcast joins")])
    )
    assert rep == {"batch": 3, "within_kept": 2, "cross_dropped": 0,
                   "added": 2}
    idx = store.read("winnow_fps")
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} \
        == {1, 3}
    assert dict(idx.dtypes)["bucket"] == "bigint"  # xxhash64 fingerprints

    rep2 = dd.add_batch(
        _docs(spark, [
            (10, _SENT),  # exact dup of stored doc 1
            (11, "entirely novel content on columnar storage formats and "
                 "fragment pruning strategies for big tables"),
        ])
    )
    assert rep2["cross_dropped"] == 1 and rep2["added"] == 1
    assert sorted(r["doc_id"] for r in dd.corpus().collect()) == [1, 3, 11]


def test_winnow_method_guarantee_catches_long_shared_run(spark, tmp_path):
    """The structural winnowing guarantee in the incremental regime: a
    round-2 doc sharing a >= k+window-1 word run with a STORED doc must
    surface as a candidate; whether it drops is then the exact-Jaccard
    verdict (precision contract unchanged)."""
    dd, _ = _mk_winnow(spark, tmp_path)
    dd.add_batch(_docs(spark, [(1, _SENT)]))
    shared = " ".join(_SENT.split()[:8])  # 8-word run >= 3+4-1
    new_bands = dd._signature_rows(
        _docs(spark, [(20, f"prefix words then {shared} and a different tail")])
    )
    cand = dd.cross_candidates(new_bands, n_rows=100)
    assert {(r["new_id"], r["old_id"]) for r in cand.collect()} == {(20, 1)}


def test_winnow_method_stored_side_never_shuffled(spark, tmp_path):
    """Same plan posture as the minhash scheme: the stored fingerprint
    table (the structure that grows) is probed by the BROADCAST delta —
    zero Exchange on the stored scan."""
    from rust_evm_indexer_spark.plans import physical_plan

    dd, _ = _mk_winnow(spark, tmp_path)
    dd.add_batch(_docs(spark, [(1, _SENT)]))
    new_bands = dd._signature_rows(_docs(spark, [(30, "novel words here")]))
    plan = physical_plan(dd.cross_candidates(new_bands, n_rows=10), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
