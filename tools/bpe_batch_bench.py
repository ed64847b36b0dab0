"""Measure batched BPE training: driver round-trips are the wall-clock
floor of vocab-table training (each merge round = one Spark job + one
collect), and batching B symbol-disjoint merges per round divides them
by ~B.  Trains the same corpus at batch=1 (classic greedy) and batch=B
and reports the wall ratio at production-shaped n_merges.

Prints one JSON line.  Run: python tools/bpe_batch_bench.py [n_merges] [batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from rust_evm_indexer_spark.operators.bpe import train_bpe, word_freqs
from rust_evm_indexer_spark.sources.batch import load_driver_table

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_driver_table(spark, SF_DIR, "documents")
    # the corpus-wide pass is shared and identical in both regimes —
    # materialize it once so the bench isolates the merge rounds
    freqs = word_freqs(docs).localCheckpoint(eager=True)
    n_vocab = freqs.count()

    t0 = time.perf_counter()
    seq = train_bpe(docs, n_merges=N_MERGES, freqs=freqs, batch=1)
    seq_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    bat = train_bpe(docs, n_merges=N_MERGES, freqs=freqs, batch=BATCH)
    bat_s = time.perf_counter() - t0

    overlap = len(set(seq) & set(bat))
    print(
        json.dumps(
            {
                "metric": "bpe_batch_train",
                "n_merges": N_MERGES,
                "batch": BATCH,
                "vocab_words": n_vocab,
                "sequential_sec": round(seq_s, 1),
                "batched_sec": round(bat_s, 1),
                "speedup": round(seq_s / bat_s, 2),
                "merge_overlap": overlap,
                "merge_overlap_frac": round(overlap / max(len(seq), 1), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
