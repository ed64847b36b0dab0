#!/usr/bin/env python3
"""Store-maintenance soak (VERDICT r7 item 6): continuous ingest plus
random takedowns with ``TableStore.maintain_store(policy)`` closing the
loop each round, asserting via ``stats()`` that read amplification
stays BOUNDED while the workload churns:

- fragment count never exceeds ``max_fragments`` + the per-round batch
  count (ingest between passes is the only allowed overshoot, and the
  next pass drains it);
- projection LSM lag is ≤ ``max_projection_lag`` after every pass, so
  ``read_projection``'s tail union stays O(policy), not O(history);
- on-disk bytes track LIVE rows (vacuum reclaims superseded
  generations): bytes/row at the end ≤ 3x the single-generation
  baseline measured on round 1;
- manifest metadata is pruned to ``keep_manifests``;
- and the data is RIGHT throughout: after every round the store's
  visible ids equal the python-side expected set (ingested minus taken
  down), through both the base table and the maintained projection.

Run: ``python tools/soak_store.py`` (~1-2 min). Prints one JSON line
with ``all_pass``; SCALE.md records the measured numbers.
"""
from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROUNDS = 12
BATCHES_PER_ROUND = 3
ROWS_PER_BATCH = 400
TAKEDOWNS_PER_ROUND = 120


def main() -> int:
    from rust_evm_indexer_spark.session import get_spark
    from rust_evm_indexer_spark.store import MaintenancePolicy, TableStore

    spark = get_spark("soak-store")
    root = Path(tempfile.mkdtemp(prefix="soak_store_"))
    store = TableStore(
        spark, root / "store", bloom_columns={"pts": ("addr",)},
        dict_columns={},
    )
    pol = MaintenancePolicy(
        max_fragments=6, max_size_skew=16.0, max_projection_lag=2,
        keep_manifests=5,
    )
    rng = random.Random(8)

    live: set[int] = set()
    next_id = 0
    block = 0
    failures: list[str] = []
    bytes_per_row_r1 = None
    t0 = time.perf_counter()

    def check(cond: bool, msg: str) -> None:
        if not cond:
            failures.append(msg)

    for rnd in range(1, ROUNDS + 1):
        for _ in range(BATCHES_PER_ROUND):
            rows = [
                (next_id + i, f"0xa{(next_id + i) % 7}", block)
                for i in range(ROWS_PER_BATCH)
            ]
            store.commit({"pts": spark.createDataFrame(
                rows, "id: long, addr: string, block_number: long")})
            live.update(r[0] for r in rows)
            next_id += ROWS_PER_BATCH
            block += 1
        if rnd == 1:
            store.build_projection("pts", "by_addr", ("addr",),
                                   max_fragments=2)
        gone = rng.sample(sorted(live), TAKEDOWNS_PER_ROUND)
        store.delete_in("pts", "id", gone)
        live.difference_update(gone)

        rep = store.maintain_store(pol)
        st = store.stats()["tables"]["pts"]

        check(st["fragments"] <= pol.max_fragments,
              f"r{rnd}: {st['fragments']} fragments > {pol.max_fragments}")
        proj = st["projections"]["by_addr"]
        check(not proj["stale"], f"r{rnd}: projection stale after maintain")
        check(proj["lag_fragments"] <= pol.max_projection_lag,
              f"r{rnd}: projection lag {proj['lag_fragments']}")
        check(st["rows"] == len(live),
              f"r{rnd}: stats rows {st['rows']} != expected {len(live)}")
        got = {r["id"] for r in store.read("pts").collect()}
        check(got == live, f"r{rnd}: base table ids diverge "
                           f"({len(got)} vs {len(live)})")
        # route through the maintained projection per key; the routed
        # fragments are clustered, not exclusive, so filter to the key
        from pyspark.sql import functions as F
        pgot = sum(
            store.read_projection("pts", "by_addr", key_equals=f"0xa{a}")
            .filter(F.col("addr") == f"0xa{a}").count()
            for a in range(7)
        )
        check(pgot == len(live),
              f"r{rnd}: projection rows {pgot} != {len(live)}")
        manifests = len(list((root / "store" / "_manifests").glob("v*.json")))
        check(manifests <= pol.keep_manifests,
              f"r{rnd}: {manifests} manifests kept > {pol.keep_manifests}")
        bpr = st["bytes"] / max(st["rows"], 1)
        if rnd == 1:
            bytes_per_row_r1 = bpr
        else:
            check(bpr <= 3 * bytes_per_row_r1,
                  f"r{rnd}: bytes/row {bpr:.0f} > 3x round-1 "
                  f"{bytes_per_row_r1:.0f} — vacuum not reclaiming")
        print(f"round {rnd}: rows={st['rows']} frags={st['fragments']} "
              f"lag={proj['lag_fragments']} bytes/row={bpr:.0f} "
              f"triggers={rep['triggers'].get('pts', [])} "
              f"vacuumed={rep['vacuumed']}", file=sys.stderr)

    wall = round(time.perf_counter() - t0, 1)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "soak": "store_maintenance",
        "rounds": ROUNDS,
        "ingested": next_id,
        "taken_down": ROUNDS * TAKEDOWNS_PER_ROUND,
        "final_rows": len(live),
        "wall_sec": wall,
        "all_pass": not failures,
        "failures": failures,
    }, separators=(",", ":")), flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
