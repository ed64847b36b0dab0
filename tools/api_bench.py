#!/usr/bin/env python3
"""End-to-end REST API latency bench (VERDICT r11 item 6).

The reference's headline claim is sub-millisecond indexed API reads
over Postgres on a warm single node (README.md:238).  This measures
the engine's honest equivalent: the four reference endpoints served
LIVE from a TableStore over real HTTP — every request pays the
per-request CURRENT read, and the store-backed /logs path engages the
full routing stack (projection choice, cursor-derived fragment
pruning, bloom/dict hints).  Latency here includes Flask, urllib, JSON
(de)serialization, the manifest-tier read, AND a Spark job per
data-bearing request — the honest floor for a driver-mediated
distributed engine, against the reference's in-process B-tree lookup.

Also measured separately: the cost of the first request after a
version advance (the manifest-version frame rebuild — a lazy plan
rebuild, not a data copy) vs steady same-version requests.

Store shape: a datagen mock chain committed in BATCHES (multiple
fragments + a log-structured delta tail, so manifest pruning has real
work), default bloom/dict index tiers, plus a contract_address-range
projection so POST /logs routes through read_projection.

Usage:
    python tools/api_bench.py [N_BLOCKS] [REQUESTS_PER_ENDPOINT]
Prints one JSON line:
    {"metric": "api_p95_ms", "value": ..., "unit": "ms",
     "endpoints": {"<name>": {"p50_ms": ..., "p95_ms": ...}},
     "rebuild": {...}, "n_blocks": ..., "n_logs": ...}
"""
from __future__ import annotations

import json
import statistics
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PORT = 8791


def _req(method: str, path: str, body: dict | None = None):
    r = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        method=method,
        data=json.dumps(body).encode() if body else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r, timeout=120) as resp:
        return json.loads(resp.read())


def _pcts(samples: list[float]) -> dict:
    s = sorted(samples)
    return {
        "p50_ms": round(1000 * statistics.median(s), 1),
        "p95_ms": round(1000 * s[min(len(s) - 1, int(0.95 * len(s)))], 1),
    }


def main() -> None:
    global PORT
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from rust_evm_indexer_spark import datagen
    from rust_evm_indexer_spark.api import EvmApi, create_app
    from rust_evm_indexer_spark.session import get_spark
    from rust_evm_indexer_spark.sources import load_evm_tables
    from rust_evm_indexer_spark.store import TableStore

    spark = get_spark("api_bench")
    workdir = Path(tempfile.mkdtemp(prefix="apibench-"))
    chain = datagen.generate_chain(n_blocks=n_blocks, seed=7)
    fixture_dir = datagen.write_fixtures(workdir / "fixtures", chain)
    tables = load_evm_tables(spark, fixture_dir)
    blocks, txs, logs = tables["blocks"], tables["transactions"], tables["logs"]

    # commit in block-range batches: multiple fragments + a delta tail,
    # so the per-request manifest work is the real thing, not a 1-frag
    # toy
    store = TableStore(spark, workdir / "store", checkpoint_interval=8)
    lo = datagen.START_BLOCK
    hi = lo + n_blocks
    n_batches = 12
    step = max(1, (hi - lo) // n_batches)
    for b0 in range(lo, hi, step):
        b1 = min(b0 + step, hi)
        cond = f"block_number >= {b0} AND block_number < {b1}"
        store.commit({
            "blocks": blocks.filter(cond),
            "transactions": txs.filter(cond),
            "logs": logs.filter(cond),
        })
    store.set_status({
        "indexer_name": "api_bench",
        "last_processed_block": hi - 1,
        "chain_head_at_last_poll": hi - 1,
    })
    store.build_projection(
        "logs", "by_address", ("contract_address",), max_fragments=4
    )
    n_logs = logs.count()

    app = create_app(EvmApi.from_store(store))
    threading.Thread(
        target=lambda: app.run(port=PORT, debug=False, use_reloader=False),
        daemon=True,
    ).start()
    time.sleep(1.5)

    addr = logs.groupBy("contract_address").count().orderBy(
        "count", ascending=False
    ).first()[0]
    some_block = lo + n_blocks // 2
    some_tx = txs.filter(f"block_number = {some_block}").first()["tx_hash"]

    endpoints = {
        "post_logs_address": ("POST", "/logs", {
            "address": addr, "pageSize": 50,
            "fromBlock": lo, "toBlock": hi,
        }),
        "post_logs_topic_page": ("POST", "/logs", {
            # topic0, not "topics" — post_logs reads topic0..topic3
            # only; the old "topics" key measured an UNFILTERED page
            # (r12 review)
            "topic0": datagen.TRANSFER_SIG, "pageSize": 50,
        }),
        "get_block": ("GET", f"/block/{some_block}", None),
        "get_transaction": ("GET", f"/transaction/{some_tx}", None),
        "get_stats": ("GET", "/stats", None),
    }

    results: dict[str, dict] = {}
    for name, (method, path, body) in endpoints.items():
        for _ in range(3):  # warm: JIT + frame cache for this version
            _req(method, path, body)
        samples = []
        for _ in range(n_req):
            t0 = time.perf_counter()
            _req(method, path, body)
            samples.append(time.perf_counter() - t0)
        results[name] = _pcts(samples)

    # frame-rebuild cost: advance the version (tiny status commit),
    # then time the FIRST data-bearing request against that new version
    rebuild_samples, steady_samples = [], []
    for i in range(8):
        store.set_status({
            "indexer_name": "api_bench",
            "last_processed_block": hi - 1,
            "chain_head_at_last_poll": hi - 1 + i,
        })
        t0 = time.perf_counter()
        _req("GET", f"/block/{some_block}")
        rebuild_samples.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _req("GET", f"/block/{some_block}")
        steady_samples.append(time.perf_counter() - t0)
    rebuild = {
        "first_after_version_advance": _pcts(rebuild_samples),
        "same_version_steady": _pcts(steady_samples),
    }

    # the Spark route (fast=False) on a second port — the honest
    # comparison column: same store, same requests, every read a Spark
    # job with projection routing
    spark_port = PORT + 1
    slow_app = create_app(EvmApi.from_store(store, fast=False))
    threading.Thread(
        target=lambda: slow_app.run(
            port=spark_port, debug=False, use_reloader=False
        ),
        daemon=True,
    ).start()
    time.sleep(1.5)
    PORT = spark_port
    spark_route: dict[str, dict] = {}
    for name, (method, path, body) in endpoints.items():
        for _ in range(3):
            _req(method, path, body)
        samples = []
        for _ in range(max(10, n_req // 2)):
            t0 = time.perf_counter()
            _req(method, path, body)
            samples.append(time.perf_counter() - t0)
        spark_route[name] = _pcts(samples)

    worst_p95 = max(r["p95_ms"] for r in results.values())
    print(json.dumps({
        "metric": "api_p95_ms",
        "value": worst_p95,
        "unit": "ms",
        "endpoints": results,
        "spark_route": spark_route,
        "rebuild": rebuild,
        "n_blocks": n_blocks,
        "n_logs": n_logs,
        "requests_per_endpoint": n_req,
    }))


if __name__ == "__main__":
    main()
