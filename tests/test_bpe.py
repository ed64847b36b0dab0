"""Distributed BPE: merge sequence equals a single-machine reference
implementation (same deterministic tie-break), encode is lossless, and
the corpus-side plan stays JVM (vocab-only Python, broadcast join)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators.bpe import (
    encode_corpus,
    train_bpe,
    word_freqs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook in-memory BPE with the same tie-break (count desc, then
    (a, b) lexicographic) — the independent twin the distributed trainer
    must reproduce exactly."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == best[0] and s == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


_CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low and wide and new",
]


def test_train_matches_reference_implementation(spark):
    docs = _docs(spark, _CORPUS)
    wf = {
        r["word"]: r["freq"] for r in word_freqs(docs).collect()
    }
    want = _reference_bpe(wf, n_merges=12)
    got = train_bpe(docs, n_merges=12)
    assert got == want


def test_encode_is_lossless_and_counts_tokens(spark):
    docs = _docs(spark, _CORPUS)
    merges = train_bpe(docs, n_merges=8)
    enc = encode_corpus(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    # losslessness: concatenated tokens reproduce the normalized words
    for i, text in enumerate(_CORPUS):
        words = text.split()
        toks = rows[i]["tokens"]
        assert "".join(toks) == "".join(words)
        assert rows[i]["n_tokens"] == len(toks) <= sum(len(w) for w in words)


def test_more_merges_monotonically_compress(spark):
    docs = _docs(spark, _CORPUS)
    m4 = train_bpe(docs, n_merges=4)
    m12 = train_bpe(docs, n_merges=12)
    assert m12[:4] == m4  # merge sequence is prefix-stable
    n4 = encode_corpus(docs, m4).agg(F.sum("n_tokens")).first()[0]
    n12 = encode_corpus(docs, m12).agg(F.sum("n_tokens")).first()[0]
    assert n12 <= n4


def test_encode_plan_is_vocab_python_corpus_jvm(spark):
    from rust_evm_indexer_spark.plans import physical_plan

    docs = _docs(spark, _CORPUS)
    merges = train_bpe(docs, n_merges=4)
    plan = physical_plan(encode_corpus(docs, merges), "simple")
    # the Python eval runs before the broadcast exchange (vocab side);
    # the corpus join is a broadcast hash join, never shuffled/cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("ArrowEvalPython") == 1


def _reference_bpe_batched(word_counts: dict[str, int], n_merges: int, batch: int):
    """Single-machine twin of the BATCHED trainer: per round, rank every
    pair (count desc, pair lexicographic), examine the same bounded
    candidate list, accept via the shared select_batch rule, and apply
    the accepted merges in rank order."""
    from rust_evm_indexer_spark.operators.bpe import (
        BATCH_CANDIDATE_FACTOR,
        select_batch,
    )

    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    while len(merges) < n_merges:
        take = min(batch, n_merges - len(merges))
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        cands = [p for p, _ in ranked[: max(take * BATCH_CANDIDATE_FACTOR, 1)]]
        chosen = select_batch(cands, take)
        merges.extend(chosen)
        for best in chosen:
            new_vocab = {}
            for syms, c in vocab.items():
                out = []
                for s in syms:
                    if out and out[-1] == best[0] and s == best[1]:
                        out[-1] = best[0] + best[1]
                    else:
                        out.append(s)
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
            vocab = new_vocab
    return merges


def test_batched_train_matches_batched_reference(spark):
    docs = _docs(spark, _CORPUS)
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    for b in (2, 4):
        want = _reference_bpe_batched(wf, n_merges=12, batch=b)
        got = train_bpe(docs, n_merges=12, batch=b)
        assert got == want, f"batch={b}"
        assert len(got) == 12


def test_batch_of_one_is_exact_classic_greedy(spark):
    docs = _docs(spark, _CORPUS)
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert train_bpe(docs, n_merges=10, batch=1) == _reference_bpe(wf, 10)


def test_batched_encode_still_lossless(spark):
    docs = _docs(spark, _CORPUS)
    merges = train_bpe(docs, n_merges=12, batch=4)
    rows = {r["doc_id"]: r for r in encode_corpus(docs, merges).collect()}
    for i, text in enumerate(_CORPUS):
        assert "".join(rows[i]["tokens"]) == "".join(text.split())
