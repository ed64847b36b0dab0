#!/usr/bin/env python3
"""Two-point scaling measurement (VERDICT r10 item 5).

The 100 TB story was argued from plans and metadata microbenches; this
tool measures it ON DATA: the 5 heaviest catalog entries (driver-cold
ranking, VERDICT r10 plan audit) plus the flagship log page, each
executed at sf0.1 AND at a deterministic 10x corpus, recording the
wall-time ratio.  An entry whose plan is genuinely
linear-with-partition-parallelism should grow <= ~10x (usually less:
fixed JVM/planning overhead amortizes); superlinear growth names a
stage that would kill a 100x scale-up.

Corpus: tools/soak_10x.py's 10x documents/embeddings (word-suffix and
rotation construction — see its module docstring), extended here with
a 10x ``events`` table (10 copies, event_id/user_id strided, ts
preserved) for the flagship page query.

Protocol: per (entry, scale) the entry runs twice in one session with
caches cleared before each run; the SECOND run is recorded (the first
pays JIT + parquet footer cache, the same convergence bench.py's
steady protocol uses; full runs kept in the JSON for audit).  Ratios
are computed second-run/second-run at equal session warmth.

Run: ``python tools/scale_twopoint.py`` (~10-20 min).  Prints one JSON
line and writes .soak_cache/scale_twopoint.json; SCALE.md records the
table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.soak_10x import COPIES, ID_STRIDE, SOAK, SRC, build_corpus  # noqa: E402

ENTRIES = [
    "dedup_winnowing",
    "dedup_spans_global",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "logs_page_first",
]


def build_events() -> None:
    """10x events: copy k strides event_id/user_id; ts/type/value/props
    are preserved byte-for-byte (pure pyarrow — no pandas round-trip,
    so the timestamp physical type survives)."""
    if (SOAK / "_DONE_EVENTS").exists():
        return
    t = pq.read_table(SRC / "events.parquet")
    parts = []
    for k in range(COPIES):
        c = t
        if k:
            c = c.set_column(
                c.schema.get_field_index("event_id"),
                "event_id",
                pc.add(c["event_id"], k * ID_STRIDE),
            )
            c = c.set_column(
                c.schema.get_field_index("user_id"),
                "user_id",
                pc.add(c["user_id"], k * ID_STRIDE),
            )
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), SOAK / "events.parquet")
    (SOAK / "_DONE_EVENTS").write_text("ok")


def main() -> None:
    build_corpus()
    build_events()

    from rust_evm_indexer_spark.catalog import CATALOG, clear_session_caches
    from rust_evm_indexer_spark.session import get_spark

    spark = get_spark("scale_twopoint")
    points = {"sf0.1": str(SRC), "10x": str(SOAK)}
    out: dict[str, dict] = {}

    for name in ENTRIES:
        rec: dict[str, dict] = {}
        for label, sf in points.items():
            runs = []
            for _ in range(2):
                clear_session_caches()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = CATALOG[name].fn(spark, sf).count()
                runs.append(round(time.perf_counter() - t0, 2))
            rec[label] = {"runs": runs, "sec": runs[-1], "rows_out": n}
        ratio = rec["10x"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9)
        rec["ratio"] = round(ratio, 2)
        rec["linear_ok"] = ratio <= 13.0  # 10x data + scheduling slack
        out[name] = rec
        print(f"# {name}: {rec['sf0.1']['sec']}s -> {rec['10x']['sec']}s "
              f"({rec['ratio']}x)", file=sys.stderr)

    result = {
        "scale_factor": COPIES,
        "entries": out,
        "all_linear": all(r["linear_ok"] for r in out.values()),
    }
    (REPO / ".soak_cache" / "scale_twopoint.json").write_text(
        json.dumps(result, indent=1)
    )
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
