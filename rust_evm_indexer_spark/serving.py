"""Latency tier: manifest-pruned Arrow point/page reads — no Spark job.

The reference's headline is sub-millisecond indexed reads
(README.md:238) — a B-tree hit inside a warm single-node database.  A
Spark job cannot answer in that envelope: driver scheduling + task
launch put a ~60-150 ms floor under every request (measured,
SCALE.md r12).  The lakehouse answer is an explicit SERVING TIER over
the same storage: the manifest already narrows a point/page read to a
handful of fragments (min/max block bounds, inline dictionaries, bloom
sidecars — :meth:`TableStore.prune_fragments`, the SAME tiers the Spark
path prunes with), and at page sizes ≤ 100 rows the residual scan is a
few parquet row groups — a job pyarrow executes in-process in
milliseconds.  Spark remains the analytics engine (every catalog entry,
every oracle-checked operator); this module only re-executes the API's
point/page REQUESTS against the identical fragment layout.

Semantics are pinned to the Spark path, not reimplemented freely:

- predicates reproduce ``operators/logs._predicates`` exactly (the
  hash-overrides-range branch, case-insensitive hex equality via
  lowercased literals — columns are lowercased at ingest, matching
  ``functions.evm.hex_eq`` — independently ANDed topics, the row-value
  keyset cursor), and the identifier/hash validation is literally the
  same functions (``parse_block_identifier`` / ``validate_tx_hash``);
- the page order is the reference's (block_number ASC, id ASC) with the
  same clamps, legacy OFFSET path, and last-row cursor derivation;
- `tests/test_serving.py` drives randomized filters through BOTH paths
  and asserts identical pages, so the tiers cannot drift apart.

Scale posture: fragments are block-clustered, so the scan visits them
in min_block order and STOPS once the page's k-th row precedes every
remaining fragment (the file-skipping analog of the reference walking
its B-tree in index order and stopping at LIMIT).  Deep keyset cursors
prune at the manifest tier exactly like the Spark route (the cursor
implies ``block_number >= cursor_block``).  A page over a 100 TB table
therefore reads the fragments AT the cursor, not the table.
"""

from __future__ import annotations

from typing import Any

from .operators.logs import LOGS_PROJECTION, GetLogsFilter, LogsPage
from .operators.lookups import parse_block_identifier, validate_tx_hash


class ServingFallback(Exception):
    """Raised when a request survives index-tier pruning with more
    fragments than the latency tier should scan in-process — e.g. a
    HOT address present in every fragment (blooms prune nothing) with
    no block bounds.  The API layer falls back to the Spark route,
    which has projection routing and distributed scan for exactly this
    shape (r12 review): the tiers split by REQUEST COST, not by
    endpoint."""


class ArrowServing:
    """Point/page executor over a :class:`TableStore` via pyarrow.

    Reads are LIVE the same way the Spark API path is: every request
    resolves the CURRENT manifest (one tiny read), prunes fragments
    through the store's index tiers, and scans only the survivors with
    parquet row-group predicate pushdown.  ``max_fragments`` bounds the
    in-process work per request: past it, :class:`ServingFallback`
    routes the request to the Spark path."""

    def __init__(self, store, max_fragments: int = 64):
        self.store = store
        self.max_fragments = max_fragments

    # -- shared fragment scan ------------------------------------------

    def _scan(
        self,
        table: str,
        *,
        pa_filter,
        columns: list[str] | None,
        min_block: int | None = None,
        max_block: int | None = None,
        equals: dict[str, Any] | None = None,
        stop_after: int | None = None,
        ordered: bool = False,
    ) -> list[dict]:
        """One bounded retry around :meth:`_scan_once`: a vacuum can
        reclaim a fragment between this request's CURRENT resolution
        and its read (the store's documented reader-grace contract) —
        re-resolving and re-scanning against the fresh manifest turns
        that transient into a correct answer instead of a 500.  A
        second consecutive failure propagates (something is actually
        wrong)."""
        try:
            return self._scan_once(
                table, pa_filter=pa_filter, columns=columns,
                min_block=min_block, max_block=max_block, equals=equals,
                stop_after=stop_after, ordered=ordered,
            )
        except FileNotFoundError:
            # narrow on purpose (r12 review): FileNotFoundError is the
            # reclaim signature both backends raise; a broader OSError
            # (EMFILE, EACCES, disk errors) is not the vacuum race and
            # must surface immediately, not after a doubled scan
            return self._scan_once(
                table, pa_filter=pa_filter, columns=columns,
                min_block=min_block, max_block=max_block, equals=equals,
                stop_after=stop_after, ordered=ordered,
            )

    def _scan_once(
        self,
        table: str,
        *,
        pa_filter,
        columns: list[str] | None,
        min_block: int | None = None,
        max_block: int | None = None,
        equals: dict[str, Any] | None = None,
        stop_after: int | None = None,
        ordered: bool = False,
    ) -> list[dict]:
        """Prune → per-fragment pyarrow scan → row dicts.

        ``stop_after`` + ``ordered``: visit fragments in min_block
        order and stop once ``stop_after`` rows are collected AND the
        ``stop_after``-th smallest (block_number, id) precedes every
        remaining fragment's min_block — early termination that cannot
        drop a row of the final page even when fragments overlap.

        Python never sees more than ~``stop_after`` rows per fragment:
        the filtered Arrow table is sorted + sliced C-side before
        ``to_pylist`` (a low-selectivity filter over a million-row
        fragment costs an Arrow sort, not a million Python dicts —
        r12 review).  Responses carry the MANIFEST schema's columns
        exactly like the Spark route: an evolved column a fragment
        predates reads as None, never as a missing key."""
        import pyarrow.dataset as pa_ds

        m, frags = self.store.prune_fragments(
            table, min_block=min_block, max_block=max_block, equals=equals
        )
        if len(frags) > self.max_fragments:
            raise ServingFallback(
                f"{table}: {len(frags)} fragments survive pruning "
                f"(> {self.max_fragments}) — route to the Spark path"
            )
        schema = self.store._read_schema(m, table)
        ref_cols = columns
        if ref_cols is None and schema is not None:
            ref_cols = list(schema.names)
        if ordered:
            frags = sorted(
                frags,
                key=lambda f: (f.min_block is None, f.min_block, f.path),
            )
        rows: list[dict] = []
        for i, frag in enumerate(frags):
            ds = pa_ds.dataset(
                str(self.store.root / frag.path), format="parquet"
            )
            cols = ref_cols
            if cols is not None:
                present = set(ds.schema.names)
                cols = [c for c in cols if c in present]
            tbl = ds.to_table(filter=pa_filter, columns=cols)
            if stop_after is not None:
                if ordered:
                    tbl = tbl.sort_by(
                        [("block_number", "ascending"), ("id", "ascending")]
                    )
                tbl = tbl.slice(0, stop_after)
            batch_rows = tbl.to_pylist()
            if ref_cols is not None and batch_rows and len(cols) != len(ref_cols):
                missing = [c for c in ref_cols if c not in cols]
                for r in batch_rows:
                    for c in missing:
                        r[c] = None  # evolved column absent here: NULL
            rows.extend(batch_rows)
            if stop_after is not None and len(rows) >= stop_after:
                if not ordered:
                    break  # point lookup: any hit suffices
                import heapq

                # k-th smallest via a bounded heap, not a full re-sort
                # of the accumulated rows per iteration (r12 review)
                bound = heapq.nsmallest(
                    stop_after,
                    ((r["block_number"], r["id"]) for r in rows),
                )[-1][0]
                rest = frags[i + 1:]
                if all(
                    f.min_block is not None and f.min_block > bound
                    for f in rest
                ):
                    break
        return rows

    # -- POST /logs -----------------------------------------------------

    def get_logs_page(self, flt: GetLogsFilter) -> LogsPage:
        """The flagship page, Arrow-executed: same predicates, same
        (block_number, id) order, same clamps/offset/cursor as
        ``operators.logs.get_logs`` (equivalence property-tested)."""
        import pyarrow.dataset as pa_ds

        f = pa_ds.field
        preds = []
        equals: dict[str, Any] = {}
        eff_from = flt.from_block
        if flt.block_hash is not None:
            # O-14a: hash overrides the range branch entirely
            preds.append(f("block_hash") == flt.block_hash.lower())
            equals["block_hash"] = flt.block_hash
            eff_from = None
            eff_to = None
        else:
            if flt.has_cursor:
                cb = flt.cursor_block if flt.cursor_block is not None else 0
                eff_from = cb if eff_from is None else max(eff_from, cb)
            if flt.from_block is not None:
                preds.append(f("block_number") >= flt.from_block)
            if flt.to_block is not None:
                preds.append(f("block_number") <= flt.to_block)
            eff_to = flt.to_block
        if flt.address is not None:
            preds.append(f("contract_address") == flt.address.lower())
            equals["contract_address"] = flt.address
        for i, t in enumerate(
            (flt.topic0, flt.topic1, flt.topic2, flt.topic3)
        ):
            if t is not None:
                preds.append(f(f"topic{i}") == t)
        if flt.topic0 is not None:
            equals["topic0"] = flt.topic0
        if flt.has_cursor:
            cb = flt.cursor_block if flt.cursor_block is not None else 0
            cl = flt.cursor_log_id if flt.cursor_log_id is not None else 0
            preds.append(
                (f("block_number") > cb)
                | ((f("block_number") == cb) & (f("id") > cl))
            )
        expr = None
        for p in preds:
            expr = p if expr is None else expr & p

        size = flt.clamped_page_size()
        offset = 0
        if not flt.has_cursor and flt.page is not None:
            offset = (flt.clamped_page() - 1) * size
        target = offset + size
        rows = self._scan(
            "logs",
            pa_filter=expr,
            columns=[src for src, _ in LOGS_PROJECTION],
            min_block=eff_from,
            max_block=eff_to,
            equals=equals or None,
            stop_after=target,
            ordered=True,
        )
        rows.sort(key=lambda r: (r["block_number"], r["id"]))
        page = [
            {out: r[src] for src, out in LOGS_PROJECTION}
            for r in rows[offset:target]
        ]
        if page:
            tail = page[-1]
            return LogsPage(page, tail["block_number"], tail["id"])
        return LogsPage(page, None, None)

    # -- point lookups --------------------------------------------------

    def get_block(self, identifier: str) -> dict | None:
        import pyarrow.dataset as pa_ds

        kind, key = parse_block_identifier(identifier)
        if kind == "hash":
            rows = self._scan(
                "blocks",
                pa_filter=pa_ds.field("block_hash") == key,
                columns=None,
                equals={"block_hash": key},
                stop_after=1,
            )
        else:
            rows = self._scan(
                "blocks",
                pa_filter=pa_ds.field("block_number") == key,
                columns=None,
                min_block=key,
                max_block=key,
                stop_after=1,
            )
        return rows[0] if rows else None

    def get_transaction(self, tx_hash: str) -> dict | None:
        import pyarrow.dataset as pa_ds

        h = validate_tx_hash(tx_hash)
        rows = self._scan(
            "transactions",
            pa_filter=pa_ds.field("tx_hash") == h,
            columns=None,
            equals={"tx_hash": h},
            stop_after=1,
        )
        return rows[0] if rows else None
