"""Winnowing hash-backend economics: md5 (hex strings, the oracle
path) vs xxhash64 (8-byte longs, the pipeline path) on the sf0.1
documents table — same k/window/df-cap, same guarantee.

Measures 3 runs per backend and compares STEADY STATE (best of runs
2-3; run 1 pays JIT — see SCALE.md round-7 measurement protocol).

Prints one JSON line:
  {"md5": [t1,t2,t3], "xxhash64": [t1,t2,t3], "speedup_steady": r}

Run: python tools/winnow_bench.py  (~1-2 min)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from rust_evm_indexer_spark.operators import dedup as dd
    from rust_evm_indexer_spark.session import get_spark
    from rust_evm_indexer_spark.sources.batch import load_driver_table

    spark = get_spark("winnow_bench")
    docs = load_driver_table(spark, "/root/testdata/sf0.1", "documents")
    out: dict = {}
    for hash_fn in ("md5", "xxhash64"):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            dd.winnow_pairs(
                docs, k=3, window=4, min_shared=2, doc_freq_cap=50,
                hash_fn=hash_fn,
            ).count()
            ts.append(round(time.perf_counter() - t0, 2))
        out[hash_fn] = ts
    out["speedup_steady"] = round(
        min(out["md5"][1:]) / min(out["xxhash64"][1:]), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
