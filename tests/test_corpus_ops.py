"""Unit tests for operators/corpus.py: connected components, quality
gate, PII scan, deterministic sampling, sequence packing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators import corpus as cp


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4-5 (diameter 4 → needs >1 propagation round),
    # triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = {
        (r.node, r.component_id)
        for r in cp.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_dedup_clusters_singletons_keep_own_id(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "a_id long, b_id long")
    got = {(r.doc_id, r.component_id) for r in cp.dedup_clusters(docs, pairs).collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 0), (4, 4), (5, 0)}


def test_gopher_quality_flags_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over lazy dogs near riverbank "
                "while birds watch quietly from tall green trees today"),
            (2, "spam " * 40),  # one word repeated: ttr + top_frac fail
            (3, "too short"),  # n_words fail
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cp.gopher_quality(docs).collect()}
    assert rows[1].keep is True
    assert rows[2].keep is False and rows[2].top_word_frac == 1.0
    assert rows[3].keep is False and rows[3].n_words == 2


def test_pii_scan_counts_and_masks(spark):
    docs = spark.createDataFrame(
        [(1, "mail a@b.io and c.d@e.org ip 10.0.0.1 call 555-1234 x")],
        "doc_id long, text string",
    )
    row = cp.pii_scan(docs, text_col="text").collect()[0]
    assert (row.n_emails, row.n_ips, row.n_phones) == (2, 1, 1)
    # masked text has no raw matches left
    masked = cp.with_synthetic_pii(docs)  # reuse aug path for coverage
    assert masked.select("pii_text").first()[0].endswith("01")


def test_stratified_sample_deterministic_and_rate(spark):
    docs = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    a = cp.stratified_sample(docs, {"en": 0.5}, 0.1).count()
    b = cp.stratified_sample(docs.repartition(13), {"en": 0.5}, 0.1).count()
    assert a == b  # partition-layout independent
    assert abs(a - 5000) < 300  # ~rate, multiplicative hash is uniform


def test_pack_sequences_respects_group_and_budget(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 10, f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    out = cp.pack_sequences(docs, window_tokens=35, text_col="text").collect()
    # 10 docs x 10 tokens per source; windows hold floor coverage of 35
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
        assert r.total_tokens <= 40  # <= window + one doc overflow
    assert set(by_src) == {"s0", "s1"}
    for rs in by_src.values():
        assert sum(r.n_docs for r in rs) == 10


def test_contamination_report_flags_overlap(spark):
    """A training doc sharing >= min_hits distinct 5-grams with a
    benchmark doc is flagged; disjoint docs are not; benchmark docs are
    never scored; hit counts are DISTINCT n-grams (repeats collapse)."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # benchmark member
            (1, bench_text + " extra words here"),  # heavy overlap
            (2, "alpha beta gamma delta epsilon"),  # exactly 1 shared 5-gram
            (3, "totally different words without any shared phrases at all"),
            # repeated phrase: the SAME 5-gram twice must count once
            (4, bench_text + " filler " + bench_text),
        ],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") == 0).select("doc_id")
    rep = {
        r["doc_id"]: r
        for r in cp.contamination_report(docs, bench, k=5, min_hits=2).collect()
    }
    assert 0 not in rep  # benchmark rows are the source, never scored
    assert rep[1]["contaminated"] and rep[1]["n_hits"] == 5
    assert rep[2]["n_hits"] == 1 and not rep[2]["contaminated"]
    assert rep[3]["n_hits"] == 0 and not rep[3]["contaminated"]
    assert rep[4]["n_hits"] == 5  # distinct overlap, not occurrence count

    kept = {
        r["doc_id"]
        for r in cp.decontaminate(docs, bench, k=5, min_hits=2).collect()
    }
    assert kept == {2, 3}


@pytest.mark.slow
def test_star_cc_matches_propagation(spark):
    """Large-star/small-star contraction must produce exactly the same
    (node, min-id component) labeling as min-label propagation on graphs
    where propagation provably converges."""
    import random

    cases = {
        "path60": [(i, i + 1) for i in range(60)],
        # a center with TWO smaller neighbors — the case where a naive
        # small-star that re-attaches only the center severs n2
        "multi-small": [(10, 3), (10, 7), (7, 5)],
        "clique+pair": [(i, j) for i in range(20) for j in range(i)]
        + [(1000, 1001)],
        "random": [
            (r.randrange(300), r.randrange(300))
            for r in [random.Random(7)]
            for _ in range(250)
        ],
    }
    for name, edges in cases.items():
        pairs = spark.createDataFrame(edges, "a_id long, b_id long")
        prop = {
            (r.node, r.component_id)
            for r in cp.connected_components(pairs, max_iter=200).collect()
        }
        star = {
            (r.node, r.component_id)
            for r in cp.connected_components_star(pairs).collect()
        }
        assert star == prop, name


@pytest.mark.slow
def test_star_cc_adversarial_diameter(spark):
    """Diameter-300 path: min-label propagation needs ~300 rounds (it
    cannot finish within any practical budget); star contraction must
    converge within its 30-round cap and still label every node with the
    true component min."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "a_id long, b_id long"
    )
    got = {
        (r.node, r.component_id)
        for r in cp.connected_components_star(pairs).collect()
    }
    assert got == {(i, 0) for i in range(301)}


def test_dedup_clusters_star_algorithm(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "a_id long, b_id long")
    got = {
        (r.doc_id, r.component_id)
        for r in cp.dedup_clusters(docs, pairs, algorithm="star").collect()
    }
    assert got == {(0, 0), (1, 1), (2, 2), (3, 0), (4, 4), (5, 0)}


def test_span_dedup_removes_cross_doc_repeats_keeps_first(spark):
    # doc 1 owns span "a b c d e"; doc 2 repeats it and must lose it
    docs = spark.createDataFrame(
        [
            (1, "a b c d e unique one two three four"),
            (2, "a b c d e other words go here now"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cp.dedup_spans_global(docs).collect()}
    assert got[1].clean_text == "a b c d e unique one two three four"
    assert got[1].n_spans_dropped == 0
    assert got[2].clean_text == "other words go here now"
    assert got[2].n_spans_kept == 1 and got[2].n_spans_dropped == 1


def test_span_dedup_removes_within_doc_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e a b c d e tail bit")], "doc_id long, text string"
    )
    row = cp.dedup_spans_global(docs).first()
    # second occurrence of the span dropped; short tail span kept
    assert row.clean_text == "a b c d e tail bit"
    assert row.n_spans_kept == 2 and row.n_spans_dropped == 1


def test_span_dedup_tail_spans_never_eligible(spark):
    # identical 3-word docs: tails are < span_words, both survive
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in cp.dedup_spans_global(docs).collect()}
    assert rows[1].clean_text == "x y z" and rows[2].clean_text == "x y z"
    assert rows[1].n_spans_dropped == 0 and rows[2].n_spans_dropped == 0


def test_span_dedup_fully_duplicated_doc_stays_as_empty_row(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cp.dedup_spans_global(docs).collect()}
    assert rows[1].clean_text == "a b c d e f g h i j"
    assert rows[2].clean_text == "" and rows[2].n_spans_kept == 0
    assert rows[2].n_spans_dropped == 2


def test_span_dedup_reassembly_preserves_span_order(spark):
    # drop a MIDDLE span: doc 2 shares doc 1's span in position 1
    docs = spark.createDataFrame(
        [
            (1, "p q r s t"),
            (2, "m n o aa bb p q r s t cc dd ee ff gg"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cp.dedup_spans_global(docs).collect()}
    assert rows[2].clean_text == "m n o aa bb cc dd ee ff gg"


def test_span_dedup_plan_has_no_window_over_span(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (
        cp.dedup_spans_global(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # skew posture: first-occurrence via partial-aggregating groupBy,
    # not a row_number window over the (hot) span partition
    assert "Window" not in plan
    assert "EvalPython" not in plan


# --- shuffle_shards: deterministic training-export sharding ---------------


def test_shuffle_shards_deterministic_and_balanced(spark):
    docs = spark.createDataFrame([(i,) for i in range(320)], "doc_id long")
    a = cp.shuffle_shards(docs, n_shards=8, seed=3)
    b = cp.shuffle_shards(docs.repartition(13), n_shards=8, seed=3)
    rows_a = {(r.doc_id, r.shard_id, r.pos) for r in a.collect()}
    rows_b = {(r.doc_id, r.shard_id, r.pos) for r in b.collect()}
    assert rows_a == rows_b  # partitioning-independent assignment
    sizes = (
        a.groupBy("shard_id").count().select("count").rdd.map(lambda r: r[0])
    ).collect()
    assert len(sizes) == 8
    # bijective-hash sharding of a contiguous id range is exactly balanced
    assert max(sizes) - min(sizes) <= 1
    # positions are a clean 1..size sequence per shard
    per = {
        r.shard_id: r.n
        for r in a.groupBy("shard_id").agg(
            F.count("*").alias("n"), F.max("pos").alias("mx"),
            F.min("pos").alias("mn"),
        ).select("shard_id", "n").collect()
    }
    mx = {r.shard_id: (r.mn, r.mx) for r in a.groupBy("shard_id").agg(
        F.min("pos").alias("mn"), F.max("pos").alias("mx")).collect()}
    for sid, n in per.items():
        assert mx[sid] == (1, n)


def test_shuffle_shards_seed_changes_order_not_membership(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = {(r.doc_id, r.shard_id, r.pos) for r in
         cp.shuffle_shards(docs, n_shards=4, seed=1).collect()}
    b = {(r.doc_id, r.shard_id, r.pos) for r in
         cp.shuffle_shards(docs, n_shards=4, seed=2).collect()}
    assert {d for d, _, _ in a} == {d for d, _, _ in b} == set(range(100))
    assert a != b  # a different seed is a different permutation


# --- sample_hash: overflow safety above 2^32 (ADVICE r6) -------------------


def test_sample_hash_overflow_safe_matches_python_and_duckdb(spark, duck):
    """Ids past ~3.47e9 used to overflow (id * 2654435761) in int64:
    Spark wrapped negative while ANSI engines raise.  The partial-product
    form must equal ((id % 2^32) * K) % 2^32 exactly, stay non-negative,
    and evaluate identically in DuckDB for the FULL non-negative int64
    domain."""
    ids = [
        0, 1, 7, 12345,
        3_473_400_000,            # just below the old overflow point
        3_473_400_001, 2**32 - 1,
        2**32, 2**32 + 9,         # reduce-mod-2^32 regime
        5_000_000_000, 2**48 + 3, 2**62, 2**63 - 1,
    ]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", cp.sample_hash("doc_id").alias("h")
        ).collect()
    }
    expected = {i: ((i % 2**32) * 2654435761) % 2**32 for i in ids}
    assert got == expected
    assert all(0 <= h < 2**32 for h in got.values())

    duck_rows = duck.execute(
        "SELECT doc_id, " + cp.knuth_sql("doc_id") + " AS h "
        "FROM (SELECT unnest(?) AS doc_id)", [ids]
    ).fetchall()
    assert {d: h for d, h in duck_rows} == expected


def test_shuffle_shards_handles_huge_ids(spark):
    ids = [1, 2, 3, 2**33 + 5, 2**62 + 1, 2**63 - 1]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = cp.shuffle_shards(docs, n_shards=4, seed=7).collect()
    assert {r.doc_id for r in rows} == set(ids)
    assert all(r.shard_id >= 0 and r.shuffle_key >= 0 for r in rows)
