"""Profile the dedup pipelines at a given SF dir (default sf0.1)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rust_evm_indexer_spark.operators import dedup as dd
from rust_evm_indexer_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("dedup_prof")
docs = spark.read.parquet(f"{sf}/documents.parquet")
for name, fn in [
    ("shingles", lambda: dd.word_shingles(docs)),
    ("ngram", lambda: dd.ngram_jaccard_pairs(docs, threshold=0.5)),
    ("minhash", lambda: dd.minhash_lsh_pairs(docs, threshold=0.5)),
    ("simhash", lambda: dd.simhash_pairs(docs, max_hamming=6)),
]:
    t0 = time.perf_counter()
    n = fn().count()
    print(f"RES {name}: {n} rows {time.perf_counter() - t0:.1f}s", flush=True)
