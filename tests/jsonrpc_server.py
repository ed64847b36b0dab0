"""Minimal Ethereum JSON-RPC HTTP server for tests: wraps a
MockRpcClient and serves its chain in WIRE format (camelCase fields,
0x-hex quantities), so HttpRpcClient's translation layer is exercised
against real HTTP, not a stub."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _hx(v) -> str | None:
    return None if v is None else hex(int(v))


def _wire_block(b: dict | None) -> dict | None:
    if b is None:
        return None
    out = {
        "hash": b["hash"],
        "number": hex(b["number"]),
        "parentHash": b["parent_hash"],
        "timestamp": hex(b["timestamp"]),
        "gasUsed": _hx(b["gas_used"]),
        "gasLimit": _hx(b["gas_limit"]),
        "transactions": [
            {
                "hash": t["hash"],
                "transactionIndex": hex(t["transaction_index"]),
                "from": t["from"],
                "to": t["to"],
                "value": _hx(t["value"]),
                "gasPrice": _hx(t["gas_price"]),
                "maxFeePerGas": _hx(t["max_fee_per_gas"]),
                "maxPriorityFeePerGas": _hx(t["max_priority_fee_per_gas"]),
                "gas": _hx(t["gas"]),
                "input": t["input"],
            }
            for t in b["transactions"]
        ],
    }
    if b["base_fee_per_gas"] is not None:  # pre-London blocks omit the key
        out["baseFeePerGas"] = _hx(b["base_fee_per_gas"])
    return out


def _wire_receipt(r: dict | None) -> dict | None:
    if r is None:
        return None
    out = {
        "transactionHash": r["transaction_hash"],
        "logs": [
            {
                "logIndex": hex(lg["log_index"]),
                "address": lg["address"],
                "data": lg["data"],
                "topics": lg["topics"],
            }
            for lg in r["logs"]
        ],
    }
    if r["status"] is not None:  # pre-Byzantium receipts omit status
        out["status"] = hex(r["status"])
    return out


class JsonRpcChainServer:
    """Threaded HTTP JSON-RPC façade over a MockRpcClient."""

    def __init__(self, mock):
        self.mock = mock
        self.fail_budget = 0  # next N requests answer HTTP 503
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_POST(self):
                if server.fail_budget > 0:
                    server.fail_budget -= 1
                    self.send_error(503, "injected failure")
                    return
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                method, params = body["method"], body.get("params", [])
                if method == "eth_blockNumber":
                    result = hex(server.mock.get_block_number())
                elif method == "eth_getBlockByNumber":
                    result = _wire_block(
                        server.mock.get_block_with_txs(int(params[0], 16))
                    )
                elif method == "eth_getTransactionReceipt":
                    result = _wire_receipt(
                        server.mock.get_transaction_receipt(params[0])
                    )
                else:
                    self._reply(
                        {"jsonrpc": "2.0", "id": body.get("id"),
                         "error": {"code": -32601, "message": "unknown method"}}
                    )
                    return
                self._reply(
                    {"jsonrpc": "2.0", "id": body.get("id"), "result": result}
                )

            def _reply(self, obj):
                data = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def __enter__(self) -> "JsonRpcChainServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
