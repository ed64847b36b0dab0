"""Manifest-format pruning benchmark (VERDICT r4 item 7).

Fabricates manifests with N fragment records (no data files needed —
this measures METADATA cost only) in both formats and times, per N:

- ``read_full``: load the manifest and materialize every fragment
  (what any mutation op pays);
- ``read_prune``: load the manifest and resolve a narrow block-range
  probe to its surviving fragments (what every bounded query pays —
  the hot path at 100 TB, where a table holds millions of fragments).

Expected shape: JSON read_prune grows linearly with N (the whole list
parses before pruning); parquet read_prune stays near-flat (row-group
statistics skip non-matching groups; only survivors materialize).

Run: ``python tools/manifest_bench.py [Ns...]`` — prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rust_evm_indexer_spark.store.table_store import (  # noqa: E402
    Fragment,
    Manifest,
    TableStore,
)

BLOCKS_PER_FRAG = 5


def _fabricate(n_frags: int) -> dict[str, list[Fragment]]:
    """n_frags block-range-clustered logs fragments, ingest-shaped:
    consecutive 5-block windows, realistic row counts and bloom params."""
    frags = [
        Fragment(
            path=f"data/logs/frag-{i:08x}",
            rows=1200,
            min_block=1_000_000 + i * BLOCKS_PER_FRAG,
            max_block=1_000_000 + (i + 1) * BLOCKS_PER_FRAG - 1,
            blooms={"contract_address": {"m": 4096, "k": 7, "n": 300}},
        )
        for i in range(n_frags)
    ]
    return {"logs": frags}


def _bench_format(fmt: str, n_frags: int, probes: int = 20) -> dict[str, float]:
    root = Path(tempfile.mkdtemp(prefix=f"manifest-bench-{fmt}-"))
    try:
        store = TableStore(None, root, manifest_format=fmt)
        m = Manifest(version=1, tables=_fabricate(n_frags))
        t0 = time.perf_counter()
        store._swap(m)
        write_s = time.perf_counter() - t0

        # full materialization (mutation-path cost)
        t0 = time.perf_counter()
        mm = store.current_manifest()
        n = sum(len(v) for v in mm.tables.values())
        read_full_s = time.perf_counter() - t0
        assert n == n_frags

        # narrow bounded probes (query-path cost); fresh manifest load
        # per probe — the steady state for a server answering point/range
        # queries against a continuously-advancing store
        lo = 1_000_000 + (n_frags // 2) * BLOCKS_PER_FRAG
        t0 = time.perf_counter()
        for i in range(probes):
            mm = store.current_manifest()
            surv = store.fragments_for(
                "logs", min_block=lo + i, max_block=lo + i + 9, manifest=mm
            )
            assert 1 <= len(surv) <= 4
        read_prune_s = (time.perf_counter() - t0) / probes
        return {
            "write_s": round(write_s, 4),
            "read_full_s": round(read_full_s, 4),
            "read_prune_s": round(read_prune_s, 5),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 50_000, 200_000]
    out = {"metric": "manifest_prune_bench", "results": {}}
    for n in ns:
        out["results"][str(n)] = {
            fmt: _bench_format(fmt, n) for fmt in ("json", "parquet")
        }
    # flatness check: parquet prune time from smallest to largest N
    first, last = str(ns[0]), str(ns[-1])
    pq_growth = (
        out["results"][last]["parquet"]["read_prune_s"]
        / max(out["results"][first]["parquet"]["read_prune_s"], 1e-9)
    )
    json_growth = (
        out["results"][last]["json"]["read_prune_s"]
        / max(out["results"][first]["json"]["read_prune_s"], 1e-9)
    )
    out["n_growth"] = round(ns[-1] / ns[0], 1)
    out["parquet_prune_growth"] = round(pq_growth, 2)
    out["json_prune_growth"] = round(json_growth, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
