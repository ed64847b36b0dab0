"""10x-scale soak of the dedup + ANN family (r2 VERDICT item 8).

The driver ships sf0.1 as the largest corpus (5,000 documents / 2,000
embeddings); the banding and cap constants (LSH 16x4 bands at J=0.8,
simhash 8x8 bands at hamming<=6, ``top_shingle_cap=500``,
``top_dim_cap=100``, IVF cell counts) were tuned there.  This soak
replays the family on a synthetic 10x corpus (50,000 docs / 20,000
vectors) to confirm the constants hold OFF the tuning corpus: pair
output must scale ~linearly (near-dup structure is replicated
per-copy, never across copies), candidate generation must stay
bucketed (no all-pairs blowup in wall time), and IVF recall must
survive a 10x denser cell population.

Corpus construction (deterministic, derived from the driver's sf0.1):

- documents: 10 copies; copy 0 is verbatim, copy k>0 suffixes every
  word with ``k`` (``"the quick" -> "the1 quick1"``).  Word-level
  suffixing keeps each copy's INTERNAL near-dup structure bit-identical
  (both members of a planted dup pair transform identically, so their
  Jaccard/simhash relations are preserved) while making cross-copy
  shingle sets disjoint — pair counts must therefore scale exactly 10x,
  which the soak asserts.
- embeddings: 10 copies; copy k rotates each vector by k positions
  (``np.roll``).  Rotation preserves norms and intra-copy geometry,
  decorrelates cross-copy cosine.

Run: ``python tools/soak_10x.py`` (~2-4 min).  Prints one JSON line;
SCALE.md records the measured numbers.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = Path("/root/testdata/sf0.1")
SOAK = REPO / ".soak_cache" / "sf1_10x_v2"
COPIES = 10
ID_STRIDE = 10_000_000
# word-suffix marker: must survive normalize_text (alphanumeric) and be
# absent from the source corpus, else a copy-0 word could collide with a
# suffixed copy-k word and create cross-copy shingles (a plain digit
# suffix collides with any digit-final word).  Checked at build time.
MARKER = "qz"


def build_corpus() -> None:
    if (SOAK / "_DONE").exists():
        return
    SOAK.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(SRC / "documents.parquet").to_pandas()
    # precondition for exact-10x linearity: no source word may already
    # contain the marker bigram, else suffixing creates cross-copy
    # shingle collisions and the linearity assertions fail spuriously
    assert not docs["text"].str.contains(MARKER, case=False).any(), (
        f"source corpus contains the marker {MARKER!r}; pick another"
    )
    out = []
    for k in range(COPIES):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * ID_STRIDE
        if k:
            # suffix every word with a marked copy index ("fox" ->
            # "foxqz1"): intra-copy shingle relations preserved,
            # cross-copy shingles disjoint even for digit-final words
            c["text"] = c["text"].map(
                lambda t, k=k: re.sub(r"(\w+)", rf"\g<1>{MARKER}{k}", t)
            )
        out.append(c)
    big_docs = pa.Table.from_pandas(
        __import__("pandas").concat(out, ignore_index=True), preserve_index=False
    )
    pq.write_table(big_docs, SOAK / "documents.parquet")

    emb = pq.read_table(SRC / "embeddings.parquet").to_pandas()
    mats = np.stack(emb["embedding"].to_numpy())
    eout = []
    for k in range(COPIES):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * ID_STRIDE
        if k:
            c["embedding"] = list(np.roll(mats, k, axis=1).astype(np.float32))
        eout.append(c)
    big_emb = pa.Table.from_pandas(
        __import__("pandas").concat(eout, ignore_index=True), preserve_index=False
    )
    pq.write_table(big_emb, SOAK / "embeddings.parquet")
    (SOAK / "_DONE").write_text("ok")


def main() -> None:
    build_corpus()

    from rust_evm_indexer_spark.catalog import CATALOG, clear_session_caches
    from rust_evm_indexer_spark.session import get_spark

    spark = get_spark("soak10x")
    sf = str(SOAK)

    # reference pair counts at sf0.1 (the tuning corpus) for the 10x
    # linearity assertions
    base = {}
    for name in ("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
                 "dedup_simhash", "dedup_winnowing"):
        base[name] = CATALOG[name].fn(spark, str(SRC)).count()
    clear_session_caches()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name: str) -> int:
        t0 = time.perf_counter()
        n = CATALOG[name].fn(spark, sf).count()
        timings[name] = round(time.perf_counter() - t0, 2)
        counts[name] = n
        return n

    checks: dict[str, bool] = {}

    # --- dedup family: set-based flavors must scale EXACTLY 10x (word
    # suffixing is a bijection on each copy's shingle sets, so Jaccard
    # relations are bit-identical per copy and cross-copy shingles are
    # disjoint).  Simhash is hash-valued, not set-valued: suffixed
    # shingles hash to fresh 64-bit codes, so pairs sitting near the
    # hamming<=6 threshold legitimately flip per copy — assert a +/-30%
    # band around linear instead of exact replication ------------------
    for name in ("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh"):
        n = run(name)
        checks[f"{name}_10x_linear"] = n == 10 * base[name]
    n = run("dedup_simhash")
    checks["dedup_simhash_10x_band"] = (
        0.7 * 10 * base["dedup_simhash"] <= n <= 1.3 * 10 * base["dedup_simhash"]
    )
    # winnowing is hash-ORDER-valued: suffixed grams get fresh md5s, so
    # each copy selects different window minima and near-threshold pairs
    # flip per copy (exact dups still share every fingerprint); cross-
    # copy grams are disjoint, so expect the simhash-style linear band
    n = run("dedup_winnowing")
    checks["dedup_winnowing_10x_band"] = (
        0.7 * 10 * base["dedup_winnowing"] <= n
        <= 1.3 * 10 * base["dedup_winnowing"]
    )

    # embedding flavors: rotation changes the neighbor graph (cosine
    # pairs are not copy-replicated), so assert sane bounds, not 10x
    run("dedup_embedding_cosine")
    run("dedup_embedding_lsh")
    run("dedup_survivors")
    run("dedup_clusters")
    checks["clusters_cover_corpus"] = counts["dedup_clusters"] == COPIES * 5000
    run("gopher_quality")

    # --- ANN: IVF must stay within recall of brute force at 10x cell
    # population, and the plan must still prune to probed cells ---------
    from pyspark.sql import functions as F

    from rust_evm_indexer_spark.operators import similarity as sim

    emb = spark.read.parquet(str(SOAK / "embeddings.parquet"))
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]

    t0 = time.perf_counter()
    exact = {
        r["vec_id"]
        for r in sim.brute_force_topk(emb, qvec, k=10, exclude_ids=(0,)).collect()
    }
    timings["brute_force_topk"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    run_ivf = CATALOG["similarity_ivf_kmeans"].fn(spark, sf)
    approx = {r["vec_id"] for r in run_ivf.collect()}
    timings["similarity_ivf_kmeans"] = round(time.perf_counter() - t0, 2)
    recall = len(exact & approx) / 10
    checks["ivf_recall_ge_0.8"] = recall >= 0.8

    run("similarity_ivf_topk")
    run("similarity_topk")

    result = {
        "corpus": {"documents": COPIES * 5000, "embeddings": COPIES * 2000},
        "timings_sec": timings,
        "counts": counts,
        "ivf_recall_at_10": recall,
        "checks": checks,
        "all_pass": all(checks.values()),
    }
    (REPO / ".soak_cache" / "soak_result.json").write_text(
        json.dumps(result, indent=1)
    )
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
