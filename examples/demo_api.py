"""End-to-end API demo: ingest a mock chain, serve the four reference
endpoints over real HTTP, exercise them with urllib.

Run: python examples/demo_api.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import urllib.request
from pathlib import Path
from urllib.error import HTTPError

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rust_evm_indexer_spark import datagen
from rust_evm_indexer_spark.api import EvmApi, create_app
from rust_evm_indexer_spark.ingest import EvmIngester
from rust_evm_indexer_spark.session import get_spark
from rust_evm_indexer_spark.sources.rpc import MockRpcClient
from rust_evm_indexer_spark.store import TableStore

PORT = 8765


def req(method: str, path: str, body: dict | None = None):
    r = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        method=method,
        data=json.dumps(body).encode() if body else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except HTTPError as e:
        return e.code, json.loads(e.read())


def main() -> None:
    spark = get_spark("demo_api", cpus=8, shuffle_partitions=8)
    workdir = tempfile.mkdtemp(prefix="evmapi-")
    # generate 25 blocks but expose only 20: the demo's live-read step
    # advances the visible head by 5 AFTER the API server is running
    client = MockRpcClient(
        datagen.generate_chain(n_blocks=25, seed=21),
        head=datagen.START_BLOCK + 19,
    )
    store = TableStore(spark, Path(workdir) / "store")
    EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.05
    ).run_until_caught_up()

    # store-backed surface (r10): /stats serves from the manifest tier —
    # exact counts + the inline status row, zero Spark jobs at any size
    api = EvmApi.from_store(store)
    app = create_app(api)
    threading.Thread(
        target=lambda: app.run(port=PORT, debug=False, use_reloader=False),
        daemon=True,
    ).start()
    import time

    time.sleep(1.5)

    code, stats = req("GET", "/stats")
    print(f"GET /stats -> {code}: {stats}")
    assert code == 200 and stats["ingestionLag"] == 0

    code, page = req("POST", "/logs", {"pageSize": 5, "topic0": datagen.TRANSFER_SIG})
    print(f"POST /logs -> {code}: {len(page['logs'])} rows, "
          f"cursor=({page['nextCursorBlock']}, {page['nextCursorLogId']})")
    assert code == 200

    code, page2 = req(
        "POST",
        "/logs",
        {
            "pageSize": 5,
            "topic0": datagen.TRANSFER_SIG,
            "cursorBlock": page["nextCursorBlock"],
            "cursorLogId": page["nextCursorLogId"],
        },
    )
    ids1, ids2 = {r["id"] for r in page["logs"]}, {r["id"] for r in page2["logs"]}
    print(f"POST /logs page2 -> {code}: {len(page2['logs'])} rows, disjoint={not (ids1 & ids2)}")
    assert not ids1 & ids2

    code, blk = req("GET", f"/block/{datagen.START_BLOCK + 2}")
    print(f"GET /block/{datagen.START_BLOCK + 2} -> {code}: {blk['blockHash'][:18]}…")
    code2, blk2 = req("GET", f"/block/{blk['blockHash'].upper().replace('0X','0x')}")
    assert code2 == 200 and blk2["blockNumber"] == datagen.START_BLOCK + 2

    tx_hash = next(iter(client._txs_by_block.values()))[0]["tx_hash"]
    code, tx = req("GET", f"/transaction/{tx_hash}")
    print(f"GET /transaction -> {code}: from={tx['fromAddress'][:12]}…")

    for path, want in [("/block/zzz", 400), ("/block/42", 404),
                       ("/transaction/0xnope", 400),
                       ("/transaction/0x" + "e" * 64, 404)]:
        code, body = req("GET", path)
        print(f"GET {path} -> {code} ({body['error']['message'][:40]})")
        assert code == want, (path, code, want)

    # LIVE reads (r11): the chain advances and the SAME server sees the
    # new blocks on every endpoint — no restart, no new EvmApi
    code, stats = req("GET", "/stats")  # live baseline before the advance
    tip_before = stats["lastProcessedBlock"]
    client.advance_head(5)
    EvmIngester(
        spark, client, store, start_block=datagen.START_BLOCK, backoff_base=0.05
    ).run_until_caught_up()
    code, stats2 = req("GET", "/stats")
    print(f"GET /stats after +5 blocks -> {code}: "
          f"lastProcessedBlock {tip_before} -> {stats2['lastProcessedBlock']}")
    assert stats2["lastProcessedBlock"] == tip_before + 5
    code, blk3 = req("GET", f"/block/{tip_before + 5}")
    print(f"GET /block/{tip_before + 5} (post-construction commit) -> {code}")
    assert code == 200 and blk3["blockNumber"] == tip_before + 5

    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
