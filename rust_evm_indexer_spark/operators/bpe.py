"""Distributed BPE (byte-pair encoding) vocabulary induction + encode.

Token counting (textops) assumes a tokenizer exists; this trains one
FROM the corpus — the vocabulary-induction step of a training-data
pipeline (Sennrich et al. 2015, the GPT-2 tokenizer recipe).

Scale shape, in three honest tiers:

1. **Corpus → word-frequency table, once.**  BPE statistics only ever
   depend on (distinct word, count) — industrial trainers all reduce to
   this table first.  One corpus-wide shuffle; after it, everything
   operates on the VOCAB (≈10⁶ rows for 100 TB of text), not the corpus.
2. **k merge rounds over the vocab table, distributed.**  Each round:
   explode adjacent symbol pairs weighted by word count → one hash
   aggregation → top-1 pair to the driver (a 2-field row, not data) →
   merge that pair inside every word with a codegen'd SQL fold
   (``aggregate`` lambda — left-to-right, standard BPE greedy
   semantics).  The sequential k-round structure is inherent to BPE
   (merge k depends on k-1 — every implementation iterates); what the
   distribution buys is a vocab table that never has to fit one
   machine.  Lineage is checkpoint-truncated per round.
3. **Encode = vocab-sized Python, corpus-sized JVM.**  Applying k
   merges per word is classic dictionary BPE — done ONCE per distinct
   word in an Arrow-batched Pandas UDF (cost ∝ vocab), then
   broadcast-joined back to the corpus so the 100 TB side never leaves
   the JVM.  This is the documented-good-use category of Python UDF:
   bounded input, no per-corpus-row Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-wide
    pass; everything downstream is vocab-sized."""
    return (
        docs.select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_expr(a: str, b: str) -> str:
    """SQL fold merging every left-to-right adjacent (a, b) → a||b."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return f"""
    aggregate(
      syms,
      cast(array() as array<string>),
      (acc, x) -> case
        when size(acc) > 0 and element_at(acc, -1) = '{qa}' and x = '{qb}'
          then concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}'))
        else concat(acc, array(x)) end)
    """


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    *,
    freqs: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order.  Ties break deterministically (count desc, then pair
    lexicographic) so the result is reproducible run-to-run and
    replayable by a single-machine reference implementation."""
    wf = word_freqs(docs, text_col) if freqs is None else freqs
    vocab = wf.select(
        F.split(F.col("word"), "(?!$)").alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (s, i) -> struct(s as a, element_at(syms, i + 2) as b))"
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            F.expr(_merge_expr(a, b)).alias("syms"), "freq"
        ).localCheckpoint(eager=True)  # truncate the k-round lineage
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic dictionary BPE encode: repeatedly merge the lowest-rank
    adjacent pair.  Pure Python — runs once per DISTINCT word."""
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def vocab_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(word, n_toks) over the corpus vocabulary — the exportable form
    of a trained tokenizer: token counting then reduces to a corpus-side
    JVM join + sum against this table (see the ``bpe_token_counts``
    catalog entry, which the DuckDB oracle replays over the export)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def enc_len(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(_encode_word(w, ranks)))

    return (
        word_freqs(docs, text_col)
        .select("word")
        .withColumn("n_toks", enc_len("word"))
    )


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) for every document.

    The Python encode runs over the DISTINCT words only (Arrow-batched
    pandas UDF, cost ∝ vocab); the corpus-sized side is a JVM explode +
    broadcast join + collect_list — no per-corpus-row Python."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, ranks))

    tokenized = docs.select(
        id_col,
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    vocab = tokenized.select("word").distinct().withColumn("toks", enc("word"))
    return (
        tokenized.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ).toks
            ).alias("tokens")
        )
        .select(
            id_col,
            "tokens",
            F.size("tokens").alias("n_tokens"),
        )
    )
