"""End-to-end LLM-training-data pipeline demo on the driver tables:
quality filter → near-dup dedup (MinHash-LSH) → text stats →
embedding similarity search.

Run: python examples/demo_llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rust_evm_indexer_spark.operators import dedup, similarity, textops
from rust_evm_indexer_spark.session import get_spark
from rust_evm_indexer_spark.sources.batch import load_driver_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo_llm_pipeline", cpus=8, shuffle_partitions=8)

    docs = load_driver_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. cheap quality pre-filter
    quality = textops.quality_score(docs)
    kept = docs.join(quality.where(F.col("keep")).select("doc_id"), "doc_id")
    n1 = kept.count()
    print(f"quality filter: {n0} -> {n1} docs")

    # 2. near-dup dedup (LSH candidates, exact-verified)
    pairs = dedup.minhash_lsh_pairs(kept, threshold=0.5)
    survivors = dedup.dedup_survivors(kept, pairs)
    n2 = survivors.count()
    print(f"near-dup dedup: {n1} -> {n2} docs ({pairs.count()} dup pairs)")

    # 3. corpus stats on the cleaned set
    stats = textops.text_stats(survivors).agg(
        F.round(F.avg("n_words"), 1).alias("avg_words"),
        F.round(F.avg("alpha_ratio"), 3).alias("avg_alpha"),
    ).first()
    print(f"cleaned corpus: avg_words={stats['avg_words']} "
          f"avg_alpha={stats['avg_alpha']}")

    # 4. similarity search over embeddings
    emb = load_driver_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = similarity.brute_force_topk(emb, q, k=5, exclude_ids=(0,)).collect()
    print("top-5 neighbors of vec 0:", [(r["vec_id"], r["sim"]) for r in top])
    approx = similarity.ivf_topk(emb, q, k=5, n_probe=2, exclude_ids=(0,)).collect()
    overlap = len({r["vec_id"] for r in top} & {r["vec_id"] for r in approx})
    print(f"IVF(probe=2) recall@5 vs exact: {overlap}/5")

    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
