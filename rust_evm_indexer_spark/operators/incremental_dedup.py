"""Incremental corpus dedup: each round, only the DELTA pays compute.

The batch operators (dedup.py) re-scan the whole corpus per run — right
for a one-shot cleanup, wrong for a pipeline that ingests shards
continuously: at 100 TB you cannot re-shingle yesterday's corpus to
admit today's. The streaming tier (streaming/dedup.py) handles exact
redelivery inside a watermark. This module is the third regime — the
production ingest-cadence NEAR-dup gate:

- the survivor corpus lives in a :class:`TableStore` table alongside its
  **accumulated MinHash band table** (doc_id, band, bucket);
- a new batch is deduped WITHIN itself (exact + banded MinHash), then
  its band rows equi-join the stored band table — candidates are new↔old
  bucket collisions, verified with exact Jaccard over shingles of ONLY
  the candidate docs (old texts fetched from the corpus table by
  semi-join, never a full corpus scan);
- survivors and their band rows land in ONE atomic multi-table commit —
  corpus and index cannot diverge, the same property the ingest path
  gets from the manifest swap (store/table_store.py::commit).

Per-round cost: O(delta shingles) + O(candidate pairs) + one SCAN of
the stored band table.  The scan is read-only: the delta's band rows
(batch × bands — delta-sized by construction) BROADCAST against the
stored side, so the accumulated table is probed in place with **zero
Exchange** — no shuffle write/read ever touches the one structure that
grows with the corpus (plan-asserted in
tests/test_plan_hygiene.py::test_incremental_dedup_stored_bands_never_shuffle).
Above ``delta_broadcast_cap`` band rows the join falls back to a
shuffle — at that point the delta itself is shuffle-sized and both
sides pay proportionally, which is the correct regime.  The stored
TEXT is touched only for verification candidates.

Recall contract: cross-round duplicates are caught by the banded join
(recall ≈ 0.9999 at J ≥ 0.5 with 32×2 banding; exact duplicates collide
in every band), within-round by the full batch operator. Precision is
1.0 — every emitted drop is exact-Jaccard verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..store.table_store import TableStore
from .dedup import (
    N_PERM,
    _pair_jaccard,
    dedup_survivors,
    exact_dedup,
    minhash_lsh_pairs,
    winnow_fingerprints,
    winnow_pairs,
    word_shingles,
)


def banded_minhash(
    docs: DataFrame, *, k: int = 3, n_perm: int = N_PERM, bands: int = 32
) -> DataFrame:
    """(doc_id, band, bucket) LSH band rows — the mergeable, storable
    form of a MinHash signature (same fused groupBy shape as
    dedup.minhash_lsh_pairs)."""
    rows_per_band = n_perm // bands
    sh = word_shingles(docs, k=k)
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_perm)
        ]
    )
    bands_col = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return per_doc.select("doc_id", F.explode(bands_col).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def winnow_band_rows(
    docs: DataFrame, *, k: int = 3, window: int = 4
) -> DataFrame:
    """(doc_id, band, bucket) rows from xxhash64 winnowed fingerprints
    (dedup.winnow_fingerprints) — SCHEMA-COMPATIBLE with
    :func:`banded_minhash` (band pinned to 0, bucket = the 8-byte
    fingerprint), so the whole stored-state machinery — broadcast-probe
    candidate join, atomic corpus+index commit, crash replay — is
    shared verbatim between the two signature schemes.  Winnowing's
    guarantee is STRUCTURAL rather than probabilistic: any shared word
    run of length >= k + window - 1 produces a shared fingerprint, so
    cross-round near-dups with long verbatim overlaps can never be
    missed by the candidate stage (MinHash's recall is 1 - (1-s^r)^b)."""
    fp = winnow_fingerprints(
        docs, k=k, window=window, hash_fn="xxhash64"
    )
    return fp.select(
        "doc_id", F.lit(0).alias("band"), F.col("fp").alias("bucket")
    )


class IncrementalDeduper:
    """Ingest-cadence near-dup gate over a TableStore-backed corpus.

    ``method`` picks the stored signature scheme: ``"minhash"`` (the
    default — banded MinHash, threshold-matched recall for Jaccard
    near-dups) or ``"winnow"`` (xxhash64 winnowed fingerprints — the
    MOSS guarantee for long verbatim overlaps; see
    :func:`winnow_band_rows`).  Both store the same (doc_id, band,
    bucket) shape; a given ``bands_table`` must stick to ONE method for
    its lifetime (buckets from different schemes never collide
    meaningfully but would dilute the index)."""

    #: band rows above which the delta no longer broadcasts (3 longs/row
    #: ≈ 24 B → ~200 MB serialized at the cap; past it the shuffle join
    #: is the right plan because the delta itself is shuffle-sized)
    DELTA_BROADCAST_CAP = 8_000_000

    def __init__(
        self,
        store: TableStore,
        *,
        threshold: float = 0.5,
        k: int = 3,
        n_perm: int = N_PERM,
        bands: int = 32,
        corpus_table: str = "corpus",
        bands_table: str = "minhash_bands",
        delta_broadcast_cap: int = DELTA_BROADCAST_CAP,
        method: str = "minhash",
        window: int = 4,
        winnow_doc_freq_cap: int = 50,
    ):
        if method not in ("minhash", "winnow"):
            raise ValueError(f"method must be 'minhash' or 'winnow', got {method!r}")
        self.store = store
        self.threshold = threshold
        self.k = k
        self.n_perm = n_perm
        self.bands = bands
        self.corpus_table = corpus_table
        self.bands_table = bands_table
        self.delta_broadcast_cap = delta_broadcast_cap
        self.method = method
        self.window = window
        self.winnow_doc_freq_cap = winnow_doc_freq_cap

    def _signature_rows(self, docs: DataFrame) -> DataFrame:
        if self.method == "winnow":
            return winnow_band_rows(docs, k=self.k, window=self.window)
        return banded_minhash(
            docs, k=self.k, n_perm=self.n_perm, bands=self.bands
        )

    def _within_pairs(self, docs: DataFrame) -> DataFrame:
        """Verified within-batch near-dup pairs under the active method
        — both schemes end in the same exact-Jaccard verification, so
        precision stays 1.0 regardless of the candidate generator."""
        if self.method == "minhash":
            return minhash_lsh_pairs(
                docs, threshold=self.threshold, k=self.k,
                n_perm=self.n_perm, bands=self.bands,
            )
        cand = winnow_pairs(
            docs, k=self.k, window=self.window, min_shared=1,
            doc_freq_cap=self.winnow_doc_freq_cap, hash_fn="xxhash64",
        ).select("a_id", "b_id")
        ids = (
            cand.select(F.col("a_id").alias("doc_id"))
            .union(cand.select(F.col("b_id")))
            .distinct()
        )
        sh = word_shingles(
            docs.join(F.broadcast(ids), "doc_id", "left_semi"), k=self.k
        )
        return _pair_jaccard(sh).where(
            F.col("jaccard") >= self.threshold
        ).join(F.broadcast(cand), ["a_id", "b_id"], "left_semi")

    def corpus(self) -> DataFrame:
        return self.store.read(self.corpus_table)

    def cross_candidates(
        self,
        new_bands: DataFrame,
        n_delta: int | None = None,
        *,
        n_rows: int | None = None,
    ) -> DataFrame:
        """(new_id, old_id) bucket collisions of the delta's band rows
        against the STORED band table.

        The stored side is the one structure that grows with the corpus,
        so it must only ever be SCANNED, never shuffled: the delta
        (``n_delta`` docs × bands rows — bounded by construction)
        broadcasts, and the stream side of a BroadcastHashJoin keeps its
        input partitioning — zero Exchange on the stored scan
        (plan-asserted in tests/test_plan_hygiene.py).  Past
        ``delta_broadcast_cap`` band rows the join falls back to a
        shuffle: at that size the delta itself is shuffle-sized and both
        sides pay proportionally."""
        stored_bands = self.store.read(self.bands_table)
        # delta size in SIGNATURE ROWS: fixed n_delta x bands for
        # minhash; winnowing emits a variable fingerprint count per doc,
        # so the caller passes the exact row count (n_rows) instead
        if n_rows is None:
            n_rows = (n_delta or 0) * self.bands
        delta = (
            new_bands.alias("n")
            if n_rows > self.delta_broadcast_cap
            else F.broadcast(new_bands.alias("n"))
        )
        return (
            stored_bands.alias("o")
            .join(delta, ["band", "bucket"])
            .select(
                F.col("n.doc_id").alias("new_id"),
                F.col("o.doc_id").alias("old_id"),
            )
            .distinct()
        )

    def add_batch(self, docs: DataFrame) -> dict:
        """Dedup ``docs`` within itself and against the accumulated
        corpus; commit the survivors + their band rows atomically.
        Returns ``{"batch": n, "within_kept": n, "cross_dropped": n,
        "added": n}``.  doc_ids must be globally unique (corpus
        contract)."""
        n_batch = docs.count()

        # 1. within-batch: exact first (free win), then banded near-dup
        # (exact_dedup returns survivor ids; semi-join recovers full rows)
        docs = docs.join(
            exact_dedup(docs).select("doc_id"), "doc_id", "left_semi"
        )
        pairs = self._within_pairs(docs)
        within = dedup_survivors(docs, pairs).persist()
        n_within = within.count()

        # 2. cross-round candidates: new band rows ⋈ stored band rows
        # (first round: no stored state, and an uncommitted table reads
        # as a schemaless empty frame — skip the join entirely)
        new_bands = self._signature_rows(within).persist()
        has_state = bool(
            # fragments_for keeps a delta/lazy CURRENT unhydrated (the
            # existence probe shouldn't pay O(total fragments))
            self.store.fragments_for(self.bands_table)
        )
        if has_state:
            n_sig_rows = (
                new_bands.count()  # materializes the persist anyway
                if self.method == "winnow"
                else n_within * self.bands
            )
            cand = self.cross_candidates(new_bands, n_rows=n_sig_rows).persist()
        else:
            cand = None

        # 3. verify candidates only: shingles of the candidate new docs
        # + candidate OLD docs (texts semi-joined out of the corpus
        # table — never a full corpus scan)
        dropped_ids = None
        if cand is not None and cand.limit(1).count() > 0:
            new_cand = within.join(
                F.broadcast(cand.select(F.col("new_id").alias("doc_id")).distinct()),
                "doc_id",
                "left_semi",
            )
            old_cand = self.corpus().join(
                F.broadcast(cand.select(F.col("old_id").alias("doc_id")).distinct()),
                "doc_id",
                "left_semi",
            )
            sh = word_shingles(new_cand.unionByName(old_cand), k=self.k)
            verified = _pair_jaccard(sh).where(
                F.col("jaccard") >= self.threshold
            )
            # keep only new↔old verdicts (the union also yields new↔new,
            # already resolved in step 1, and old↔old, resolved earlier);
            # canonicalize the candidate pair to (min, max) so the match
            # is a plain equi-join on the verified (a_id < b_id) output
            cand_c = cand.select(
                F.least("new_id", "old_id").alias("a_id"),
                F.greatest("new_id", "old_id").alias("b_id"),
            ).distinct()
            cross = verified.join(F.broadcast(cand_c), ["a_id", "b_id"], "left_semi")
            dropped_ids = (
                cross.select(F.col("a_id").alias("doc_id"))
                .union(cross.select(F.col("b_id")))
                .join(within.select("doc_id"), "doc_id", "left_semi")
                .distinct()
            )
        if dropped_ids is not None:
            kept = within.join(F.broadcast(dropped_ids), "doc_id", "left_anti")
            n_dropped = dropped_ids.count()
        else:
            kept, n_dropped = within, 0

        kept_bands = new_bands.join(
            kept.select("doc_id"), "doc_id", "left_semi"
        )
        # 4. one atomic commit: corpus rows + their index rows together
        self.store.commit(
            {self.corpus_table: kept, self.bands_table: kept_bands}
        )
        n_added = n_within - n_dropped
        for df in (within, new_bands, cand):
            if df is not None:
                df.unpersist()
        return {
            "batch": n_batch,
            "within_kept": n_within,
            "cross_dropped": n_dropped,
            "added": n_added,
        }
