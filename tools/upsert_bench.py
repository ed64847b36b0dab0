"""Fragment-surgical upsert economics: on a store with many fragments,
a small-key upsert should REWRITE only the fragments that actually hold
the keys, keep the rest by manifest reference, and the bloom tier
should spare even the SCAN on definitely-clean fragments.

Also sweeps candidate-fragment count 1 -> 32 at fixed key count and
fixed total rows (r7): maintenance is batched into two Spark jobs
TOTAL (_maintain_fragments_batched), so wall must stay near-flat as
the same data splits into more fragments — the r6 sequential loop paid
two jobs PER fragment and grew linearly.

Prints one JSON line:
  {"fragments": F, "keys": K,
   "bloom":   {"candidates": c, "rewritten": r, "wall_s": w},
   "nobloom": {"candidates": c, "rewritten": r, "wall_s": w},
   "scaling": {"1": w1, ..., "32": w32, "ratio_32_vs_1": r}}

Run: python tools/upsert_bench.py  (~2-3 min)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAGS = 64
ROWS_PER = 2_000
N_KEYS = 10


def build(spark, root, bloom):
    from rust_evm_indexer_spark.store import TableStore

    store = TableStore(
        spark, root,
        bloom_columns={"docs": ("doc_id",)} if bloom else {},
        dict_columns={},
    )
    for b in range(N_FRAGS):
        rows = [(b * ROWS_PER + i, f"text-{b}-{i}", b) for i in range(ROWS_PER)]
        store.commit({
            "docs": spark.createDataFrame(
                rows, "doc_id: long, text: string, block_number: long"
            )
        })
    return store


def main() -> None:
    from pyspark.sql import functions as F

    from rust_evm_indexer_spark.session import get_spark
    from rust_evm_indexer_spark.store import TableStore

    spark = get_spark("upsert_bench", cpus=8, shuffle_partitions=8)
    out = {"fragments": N_FRAGS, "keys": N_KEYS}
    for label, bloom in (("bloom", True), ("nobloom", False)):
        root = Path(tempfile.mkdtemp(prefix=f"upsert_bench_{label}_"))
        store = build(spark, root / "s", bloom)
        # keys spread across 2 fragments only
        keys = [i for i in range(5)] + [ROWS_PER * 32 + i for i in range(5)]
        batch = spark.createDataFrame(
            [(k, f"new-{k}", 999) for k in keys],
            "doc_id: long, text: string, block_number: long",
        )
        t0 = time.perf_counter()
        stats = store.upsert("docs", batch, "doc_id")
        wall = round(time.perf_counter() - t0, 2)
        assert stats["rewritten"] == 2 and stats["replaced_rows"] == 10
        got = store.read("docs").where(F.col("doc_id").isin(keys))
        assert got.count() == 10
        assert all(r["text"].startswith("new-") for r in got.collect())
        out[label] = {
            "candidates": stats["candidates"],
            "rewritten": stats["rewritten"],
            "wall_s": wall,
        }

    # -- scaling sweep: same 64k rows, same 32 keys, split into more
    # fragments; every fragment holds hit keys so candidates == F ------
    total_rows, n_keys = 64_000, 32
    out["scaling"] = {}
    for n_frags in (1, 2, 4, 8, 16, 32):
        root = Path(tempfile.mkdtemp(prefix=f"upsert_scale_{n_frags}_"))
        store_s = TableStore(spark, root / "s", bloom_columns={}, dict_columns={})
        per = total_rows // n_frags
        for b in range(n_frags):
            rows = [(b * per + i, f"text-{b}-{i}", b) for i in range(per)]
            store_s.commit({
                "docs": spark.createDataFrame(
                    rows, "doc_id: long, text: string, block_number: long"
                )
            })
        # spread the keys evenly over the row space -> at F fragments,
        # min(F, n_keys) fragments contain a key; all F are candidates
        keys = [i * (total_rows // n_keys) for i in range(n_keys)]
        batch = spark.createDataFrame(
            [(k, f"new-{k}", 999) for k in keys],
            "doc_id: long, text: string, block_number: long",
        )
        t0 = time.perf_counter()
        stats = store_s.upsert("docs", batch, "doc_id")
        wall = round(time.perf_counter() - t0, 2)
        assert stats["candidates"] == n_frags
        assert stats["rewritten"] == min(n_frags, n_keys)
        assert stats["replaced_rows"] == n_keys
        out["scaling"][str(n_frags)] = wall
    out["scaling"]["ratio_32_vs_1"] = round(
        out["scaling"]["32"] / out["scaling"]["1"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
