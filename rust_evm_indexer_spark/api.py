"""Thin REST layer: the reference's four endpoints over the Spark engine.

Mirrors the Axum API surface (``src/api.rs``):

- ``POST /logs``            — filtered + paginated log search (O-12..O-20)
- ``GET  /block/<id>``      — polymorphic point lookup (O-21)
- ``GET  /transaction/<h>`` — validated point lookup (O-22)
- ``GET  /stats``           — counts + ingestion lag (O-23/O-24)

plus O-27 (row → camelCase JSON, ``src/models.rs:9``) and O-28
(standardized error envelope: parse → 400, missing → 404, internal → 500,
``src/api.rs:28-80``).  The engine work all lives in ``operators/``; this
module is deliberately dumb — request structs in, DataFrame plans out,
bounded collects, dict JSON.

One SparkSession serves all requests (the analog of the reference's
10-connection pool is Spark's own scheduler; enable the FAIR scheduler
for concurrent endpoints on a busy deployment).
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame

from .operators.logs import (
    GetLogsFilter,
    run_get_logs,
    run_get_logs_from_store,
)
from .operators.lookups import get_block, get_stats, get_transaction


def _camel(s: str) -> str:
    head, *rest = s.split("_")
    return head + "".join(w.capitalize() for w in rest)


def to_camel_json(row: dict[str, Any]) -> dict[str, Any]:
    """O-27: snake_case row dict → camelCase JSON object."""
    return {_camel(k): v for k, v in row.items()}


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


class EvmApi:
    """Framework-independent handlers (unit-testable without HTTP).

    ``store`` (optional) routes ``/stats`` through the TableStore's
    manifest tier — exact per-fragment row counts summed manifest-side
    plus the manifest-inline status row, zero Spark jobs at any table
    size (the reference keeps /stats always-cheap through its index
    metadata, src/api.rs:243-258).  :meth:`from_store` builds the whole
    surface over a store."""

    def __init__(
        self,
        blocks: DataFrame | None,
        transactions: DataFrame | None,
        logs: DataFrame | None,
        status: DataFrame | None,
        store=None,
        fast: bool = True,
    ):
        self._blocks = blocks
        self._transactions = transactions
        self._logs = logs
        self.status = status
        self.store = store
        # store-backed serving tier (serving.py): manifest-pruned Arrow
        # point/page reads — sub-Spark-job latency, property-tested
        # equivalent to the Spark route.  `fast=False` forces every
        # request through Spark (the escape hatch, and what the
        # equivalence tests compare against).
        self._serving = None
        if store is not None and fast:
            from .serving import ArrowServing

            self._serving = ArrowServing(store)
        # store-backed: frames resolve lazily against the CURRENT
        # manifest, cached by (version, table) — version-keyed so a
        # slow request that read an older CURRENT can only ever insert
        # under its OWN version's key, never poison a newer version's
        # slot (the r11 single-version cache had exactly that race
        # under a threaded WSGI server).  Reads/inserts are plain
        # GIL-atomic dict ops; the lock only guards pruning.
        self._frames: dict[tuple[int, str], DataFrame] = {}
        self._frames_lock = threading.Lock()
        if status is None and store is None:
            raise ValueError("EvmApi needs a status DataFrame or a store")
        if store is None and (
            blocks is None or transactions is None or logs is None
        ):
            raise ValueError("EvmApi without a store needs all three frames")

    @classmethod
    def from_store(cls, store, *, fast: bool = True) -> "EvmApi":
        """All four endpoints over a :class:`TableStore`, reading LIVE
        state: every request re-resolves against the CURRENT manifest
        (the reference serves each request from a fresh pool query,
        src/api.rs:184), so a commit after construction is visible on
        /logs, /block and /transaction, /stats always agrees with them,
        and a vacuum can never strand a request on deleted fragments of
        a stale snapshot.  /stats never leaves the manifest tier.

        ``fast`` (default) serves /logs, /block and /transaction from
        the Arrow latency tier (``serving.py``) — manifest min/max +
        dict/bloom pruning and parquet row-group pushdown with no Spark
        job, property-tested result-identical to the Spark route.
        ``fast=False`` routes everything through Spark
        (``get_logs_from_store``: projection routing, cursor-derived
        fragment pruning)."""
        return cls(
            blocks=None, transactions=None, logs=None, status=None,
            store=store, fast=fast,
        )

    def _store_frame(self, table: str) -> DataFrame:
        """Manifest-version-cached live frame: one tiny CURRENT read per
        request; frames rebuild only when the version advances (a plan
        rebuild, not a data copy — Spark frames are lazy).

        Thread-safety: the cache key includes the version this request
        observed, so two concurrent requests that read different CURRENT
        versions populate different slots — a slow older request can
        never publish a stale frame under the newer version's identity.
        The frame build happens OUTSIDE the lock (it is a lazy plan
        construction; serializing it would add latency for nothing);
        the lock only guards the prune of superseded-version entries.
        """
        v = self.store.current_version()
        key = (v, table)
        frame = self._frames.get(key)
        if frame is None:
            frame = self.store.read(table)
            self._frames[key] = frame
            with self._frames_lock:
                # Drop entries for versions older than any cached key's
                # max — bounds the cache at ~one version's tables plus
                # whatever in-flight older requests just inserted.
                # Snapshot the keys first: concurrent inserts are
                # deliberately unlocked, and iterating the live dict
                # here would race them (dict-changed-size RuntimeError).
                keys = list(self._frames)
                newest = max(k[0] for k in keys)
                for k in keys:
                    if k[0] < newest:
                        self._frames.pop(k, None)
        return frame

    @property
    def blocks(self) -> DataFrame:
        return self._store_frame("blocks") if self.store is not None and self._blocks is None else self._blocks

    @property
    def transactions(self) -> DataFrame:
        return self._store_frame("transactions") if self.store is not None and self._transactions is None else self._transactions

    @property
    def logs(self) -> DataFrame:
        return self._store_frame("logs") if self.store is not None and self._logs is None else self._logs

    def get_root(self) -> str:
        """GET / — the reference's welcome handler (src/api.rs:92-94)."""
        return (
            "<h1>Hello, EVM Indexer API!</h1>"
            "<p>Welcome to your PySpark-powered API.</p>"
        )

    def post_logs(self, body: dict[str, Any]) -> dict[str, Any]:
        if not isinstance(body, dict):
            raise ApiError(400, "body must be a JSON object")
        try:
            flt = GetLogsFilter(
                block_hash=body.get("blockHash"),
                from_block=body.get("fromBlock"),
                to_block=body.get("toBlock"),
                address=body.get("address"),
                topic0=body.get("topic0"),
                topic1=body.get("topic1"),
                topic2=body.get("topic2"),
                topic3=body.get("topic3"),
                cursor_block=body.get("cursorBlock"),
                cursor_log_id=body.get("cursorLogId"),
                page=body.get("page"),
                # `limit` is an accepted alias (src/api_models.rs:38)
                page_size=int(
                    body.get("pageSize") or body.get("limit") or 25
                ),
            )
        except (TypeError, ValueError) as exc:
            raise ApiError(400, f"invalid filter: {exc}") from exc
        if self._serving is not None and self._logs is None:
            from .serving import ServingFallback

            try:
                # latency tier: same pruning tiers, no Spark job
                page = self._serving.get_logs_page(flt)
            except ServingFallback:
                # too many fragments survive pruning (hot key, no
                # bounds): the Spark route's projection routing and
                # distributed scan own this shape
                page = run_get_logs_from_store(self.store, flt)
        elif self.store is not None and self._logs is None:
            # store-backed Spark route: per-request source routing
            # (projection / bloom / dict / cursor pruning) over the
            # CURRENT manifest
            page = run_get_logs_from_store(self.store, flt)
        else:
            page = run_get_logs(self.logs, flt)
        return {
            "logs": [to_camel_json(r) for r in page.logs],
            "nextCursorBlock": page.next_cursor_block,
            "nextCursorLogId": page.next_cursor_log_id,
        }

    def get_block(self, identifier: str) -> dict[str, Any]:
        try:
            if self._serving is not None and self._blocks is None:
                from .serving import ServingFallback

                try:
                    row = self._serving.get_block(identifier)
                except ServingFallback:
                    row = get_block(self.blocks, identifier)
            else:
                row = get_block(self.blocks, identifier)
        except ValueError as exc:
            raise ApiError(400, str(exc)) from exc
        if row is None:
            raise ApiError(404, f"block not found: {identifier}")
        return to_camel_json(row)

    def get_transaction(self, tx_hash: str) -> dict[str, Any]:
        try:
            if self._serving is not None and self._transactions is None:
                from .serving import ServingFallback

                try:
                    row = self._serving.get_transaction(tx_hash)
                except ServingFallback:
                    row = get_transaction(self.transactions, tx_hash)
            else:
                row = get_transaction(self.transactions, tx_hash)
        except ValueError as exc:
            raise ApiError(400, str(exc)) from exc
        if row is None:
            raise ApiError(404, f"transaction not found: {tx_hash}")
        return to_camel_json(row)

    def get_stats(self) -> dict[str, Any]:
        if self.store is not None:
            # manifest tier: counts are per-fragment row sums resolved
            # store-side (columnar fraglist prune / delta-tail
            # arithmetic), checkpoint + lag ride the manifest-inline
            # status row — no Spark job, no file scan (VERDICT r9
            # item 3; the scan-path get_stats below stays for raw
            # parquet directories that have no store behind them)
            from .operators.lookups import IndexerStats

            status = self.store.read_status() or {}
            last = status.get("last_processed_block")
            head = status.get("chain_head_at_last_poll")
            lag = (
                (head - last)
                if head is not None and last is not None
                else None
            )
            s = IndexerStats(
                total_blocks=self.store.table_rows("blocks"),
                total_transactions=self.store.table_rows("transactions"),
                total_logs=self.store.table_rows("logs"),
                last_processed_block=last,
                chain_head=head,
                ingestion_lag=lag,
            )
        else:
            s = get_stats(
                self.blocks, self.transactions, self.logs, self.status
            )
        return to_camel_json(s.__dict__)


def create_app(api: EvmApi):
    """Flask app factory (import-gated: the engine never requires Flask)."""
    from flask import Flask, jsonify, request

    app = Flask("rust_evm_indexer_spark")

    def _envelope(exc: ApiError):
        # O-28: {"error": {"code", "message"}} with the mapped status
        return (
            jsonify({"error": {"code": exc.status, "message": exc.message}}),
            exc.status,
        )

    app.register_error_handler(ApiError, _envelope)

    @app.errorhandler(Exception)
    def _internal(exc):  # noqa: ANN001
        if isinstance(exc, ApiError):
            return _envelope(exc)
        return (
            jsonify({"error": {"code": 500, "message": f"internal: {exc}"}}),
            500,
        )

    @app.get("/")
    def root():
        # the reference's welcome/liveness handler (src/api.rs:393)
        return api.get_root(), 200, {"Content-Type": "text/html; charset=utf-8"}

    @app.post("/logs")
    def post_logs():
        return jsonify(api.post_logs(request.get_json(force=True, silent=True) or {}))

    @app.get("/block/<identifier>")
    def block(identifier: str):
        return jsonify(api.get_block(identifier))

    @app.get("/transaction/<tx_hash>")
    def transaction(tx_hash: str):
        return jsonify(api.get_transaction(tx_hash))

    @app.get("/stats")
    def stats():
        return jsonify(api.get_stats())

    @app.get("/openapi.json")
    def openapi():
        # O-28-adjacent: the reference registers Swagger docs (src/docs.rs)
        return jsonify(OPENAPI_SPEC)

    @app.get("/docs")
    def docs():
        # the reference mounts an interactive Swagger UI at /docs
        # (src/docs.rs:1-42).  This build renders the same spec with a
        # small self-contained page (no CDN assets — deployments of this
        # engine are commonly air-gapped), listing every path, method,
        # parameter schema, and response code from /openapi.json.
        return render_docs_html(OPENAPI_SPEC), 200, {
            "Content-Type": "text/html; charset=utf-8"
        }

    return app


def render_docs_html(spec: dict) -> str:
    """Self-contained API docs page from an OpenAPI spec dict."""
    from html import escape

    rows: list[str] = []
    for path, methods in spec["paths"].items():
        for method, op in methods.items():
            req = op.get("requestBody", {})
            props = (
                req.get("content", {})
                .get("application/json", {})
                .get("schema", {})
                .get("properties", {})
            )
            params = ", ".join(
                f"{escape(k)}: {escape(v.get('type', '?'))}" for k, v in props.items()
            )
            resps = ", ".join(
                f"{escape(code)} ({escape(r.get('description', ''))})"
                for code, r in op.get("responses", {}).items()
            )
            rows.append(
                "<tr>"
                f"<td class=m>{escape(method.upper())}</td>"
                f"<td class=p>{escape(path)}</td>"
                f"<td>{escape(op.get('summary', ''))}</td>"
                f"<td>{params or '—'}</td>"
                f"<td>{resps}</td>"
                "</tr>"
            )
    info = spec["info"]
    return f"""<!doctype html>
<html><head><meta charset="utf-8">
<title>{escape(info["title"])} — API docs</title>
<style>
 body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem; }}
 table {{ border-collapse: collapse; width: 100%; }}
 th, td {{ border: 1px solid #ccc; padding: .4rem .6rem; text-align: left; }}
 .m {{ font-weight: 600; }} .p {{ font-family: monospace; }}
 caption {{ text-align: left; margin-bottom: .5rem; }}
</style></head><body>
<h1>{escape(info["title"])} <small>v{escape(info["version"])}</small></h1>
<p>{escape(info.get("description", ""))}</p>
<p>Machine-readable spec: <a href="/openapi.json">/openapi.json</a></p>
<table>
<tr><th>Method</th><th>Path</th><th>Summary</th><th>Body params</th><th>Responses</th></tr>
{"".join(rows)}
</table></body></html>"""


OPENAPI_SPEC = {
    "openapi": "3.0.3",
    "info": {
        "title": "pyspark-evm-engine API",
        "version": "0.1.0",
        "description": "EVM log/block/transaction query API over the "
        "PySpark engine (parity with rust-evm-indexer's REST surface).",
    },
    "paths": {
        "/": {
            "get": {
                "summary": "Welcome message (liveness probe)",
                "responses": {"200": {"description": "HTML greeting"}},
            }
        },
        "/logs": {
            "post": {
                "summary": "Filtered + paginated event-log search",
                "requestBody": {
                    "content": {
                        "application/json": {
                            "schema": {
                                "type": "object",
                                "properties": {
                                    "blockHash": {"type": "string"},
                                    "fromBlock": {"type": "integer"},
                                    "toBlock": {"type": "integer"},
                                    "address": {"type": "string"},
                                    "topic0": {"type": "string"},
                                    "topic1": {"type": "string"},
                                    "topic2": {"type": "string"},
                                    "topic3": {"type": "string"},
                                    "cursorBlock": {"type": "integer"},
                                    "cursorLogId": {"type": "integer"},
                                    "page": {"type": "integer"},
                                    "pageSize": {
                                        "type": "integer",
                                        "maximum": 100,
                                        "default": 25,
                                    },
                                },
                            }
                        }
                    }
                },
                "responses": {"200": {"description": "LogsResponse"}},
            }
        },
        "/block/{identifier}": {
            "get": {
                "summary": "Block by number or 0x-hash",
                "responses": {
                    "200": {"description": "Block"},
                    "400": {"description": "invalid identifier"},
                    "404": {"description": "not found"},
                },
            }
        },
        "/transaction/{txHash}": {
            "get": {
                "summary": "Transaction by 66-char 0x-hash",
                "responses": {
                    "200": {"description": "Transaction"},
                    "400": {"description": "invalid hash"},
                    "404": {"description": "not found"},
                },
            }
        },
        "/stats": {
            "get": {"summary": "Counts + ingestion lag", "responses": {"200": {"description": "IndexerStats"}}}
        },
    },
}
