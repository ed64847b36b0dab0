"""Measure incremental dedup: per-round cost vs accumulated corpus size.

The claim under test: IncrementalDeduper's round cost is a function of
the DELTA (batch size + candidate pairs), not the accumulated corpus —
the property that makes ingest-cadence dedup viable at 100 TB, where a
batch re-scan (re-shingling the whole corpus each round) grows linearly
with corpus size.

Rounds of a fixed-size batch (10% planted dups of earlier rounds) are
added to a growing store; per-round wall time is reported alongside the
corpus size.  Expectation: round time ~flat while corpus grows ~Rx.

Prints one JSON line.  Run: python tools/incremental_dedup_bench.py [rounds] [batch]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from rust_evm_indexer_spark.operators.incremental_dedup import IncrementalDeduper
from rust_evm_indexer_spark.store import TableStore

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000


def _batch(spark, rnd: int, n: int):
    """n docs; 10% duplicate texts of round rnd-1 (fresh ids)."""
    rows = []
    for i in range(n):
        gid = rnd * n + i
        # 10% of every round duplicates a ROUND-0 text (ids stay fresh),
        # so each round's cross-join runs against the growing corpus
        src = i if (rnd > 0 and i % 10 == 0) else gid
        words = " ".join(f"w{src}x{j}" for j in range(40))  # disjoint per src
        rows.append((gid, f"doc {src} body {words}", "en", "web", 200))
    return spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"rounds": ROUNDS, "batch": BATCH}
    for method in ("minhash", "winnow"):
        root = Path(tempfile.mkdtemp(prefix=f"incdedup_bench_{method}_"))
        store = TableStore(spark, root, bloom_columns={}, dict_columns={})
        dd = IncrementalDeduper(
            store, threshold=0.5, method=method,
            bands_table=f"{method}_sigs",
        )

        rounds = []
        for r in range(ROUNDS):
            t0 = time.perf_counter()
            rep = dd.add_batch(_batch(spark, r, BATCH))
            dt = time.perf_counter() - t0
            corpus_n = store.table_rows(dd.corpus_table)
            rounds.append(
                {
                    "round": r,
                    "sec": round(dt, 2),
                    "added": rep["added"],
                    "cross_dropped": rep["cross_dropped"],
                    "corpus_rows": corpus_n,
                }
            )

        warm = [r["sec"] for r in rounds[1:]]  # round 0 pays JIT/codegen
        out[method] = {
            "per_round": rounds,
            "warm_first_sec": warm[0],
            "warm_last_sec": warm[-1],
            "growth_ratio_last_vs_first_warm": round(warm[-1] / warm[0], 2),
            "corpus_growth": round(
                rounds[-1]["corpus_rows"] / rounds[1]["corpus_rows"], 2
            ),
        }
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
