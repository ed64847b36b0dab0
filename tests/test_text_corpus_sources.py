"""JSONL / delimited corpus ingestion: explicit schema (no inference
pass), corrupt lines quarantined and countable (never silently dropped),
derived fields recomputed — the shard-ingest front door for the LLM
pipeline operators, normalized to the engine's documents shape."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rust_evm_indexer_spark.sources.text_corpus import (
    DOCUMENTS_SCHEMA,
    read_csv_documents,
    read_jsonl_documents,
)


def _write_jsonl(tmp_path, lines, name="shard.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return p


def test_jsonl_well_formed_roundtrip(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en",
                    "source": "web", "n_chars": 999})
        for i in range(5)
    ]
    docs, corrupt = read_jsonl_documents(spark, _write_jsonl(tmp_path, lines))
    assert corrupt.count() == 0
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == set(range(5))
    # upstream n_chars lies (999) — recomputed from the text
    assert rows[3]["n_chars"] == len("doc 3")
    assert [f.name for f in docs.schema.fields] == [
        f.name for f in DOCUMENTS_SCHEMA.fields
    ]


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{not json at all",
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "en"}),
        '{"doc_id": "NOT_A_NUMBER", "text": "type drift"}',
    ]
    docs, corrupt = read_jsonl_documents(spark, _write_jsonl(tmp_path, lines))
    assert docs.count() == 2
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("NOT_A_NUMBER" in b for b in bad)


def test_jsonl_missing_ids_derived_deterministically(spark, tmp_path):
    lines = [json.dumps({"text": t, "lang": "en"}) for t in ("alpha", "beta")]
    p = _write_jsonl(tmp_path, lines)
    docs1, _ = read_jsonl_documents(spark, p, source="crawl")
    docs2, _ = read_jsonl_documents(spark, p, source="crawl")
    a = sorted((r["doc_id"], r["text"], r["source"]) for r in docs1.collect())
    b = sorted((r["doc_id"], r["text"], r["source"]) for r in docs2.collect())
    assert a == b  # xxhash64-derived ids are stable across reads
    assert all(s == "crawl" for _, _, s in a)
    assert len({i for i, _, _ in a}) == 2


def test_jsonl_feeds_the_pipeline_operators(spark, tmp_path):
    """The normalized frame drops straight into the corpus operators —
    the contract that makes these readers the pipeline's front door."""
    from rust_evm_indexer_spark.operators.dedup import exact_dedup

    lines = [
        json.dumps({"doc_id": i, "text": "same text", "lang": "en"})
        for i in range(3)
    ] + [json.dumps({"doc_id": 9, "text": "unique", "lang": "en"})]
    docs, _ = read_jsonl_documents(spark, _write_jsonl(tmp_path, lines))
    kept = exact_dedup(docs)
    assert kept.count() == 2  # one survivor per text


def test_csv_documents_with_corrupt_row(spark, tmp_path):
    p = tmp_path / "shard.tsv"
    p.write_text(
        "doc_id\ttext\tlang\tsource\tn_chars\n"
        "1\thello world\ten\tweb\t0\n"
        "oops_not_a_number\tbroken row\ten\tweb\tx\n"
        "2\tsecond doc\tde\tweb\t0\n"
    )
    docs, corrupt = read_csv_documents(spark, p, sep="\t")
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_chars"] == len("hello world")
    assert corrupt.count() == 1
