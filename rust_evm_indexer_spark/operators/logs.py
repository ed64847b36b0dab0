"""The flagship query: filtered + cursor-paginated log search.

Re-expresses the reference's ``POST /logs`` handler (``src/api.rs:111-229``)
— a dynamically composed conjunctive filter + total order + page limit over
the ``logs`` table — as a declarative DataFrame plan.  Where the reference
builds a SQL string with ``sqlx::QueryBuilder``, here the same request
struct drives Column predicates and Catalyst does the planning: the
equality/range/topic predicates and the keyset-cursor tuple predicate all
push down to the parquet/store scan (min-max row-group pruning on
``block_number``), and ORDER BY + LIMIT plans as ``TakeOrderedAndProject``
(top-k, no full sort) — the scale-out analog of the reference's B-tree
index walk.

Operator coverage (SURVEY.md §2b): O-12 projection/aliases, O-13
case-insensitive equality, O-14 block range, O-14a hash-overrides-range
precedence, O-15 topic filters, O-16 keyset cursor, O-17 top-k, O-18
offset pagination, O-19 clamps, O-20 next-cursor derivation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.evm import hex_eq

MAX_PAGE_SIZE = 100  # src/api.rs:26
DEFAULT_PAGE_SIZE = 25  # src/api_models.rs:11-13

#: O-12 response projection as (source column, response name) pairs —
#: the single source of truth for BOTH execution tiers: the Spark plan
#: builds its Columns from this list and the Arrow serving tier renames
#: by it, so a one-sided edit cannot silently de-synchronize the
#: response shapes (src/api.rs:118-124).
LOGS_PROJECTION: list[tuple[str, str]] = [
    ("id", "id"),
    ("log_index_in_tx", "log_index"),
    ("transaction_hash", "transaction_hash"),
    ("transaction_index_in_block", "transaction_index"),
    ("block_number", "block_number"),
    ("block_hash", "block_hash"),
    ("contract_address", "address"),
    ("data", "data"),
    ("topic0", "topic0"),
    ("topic1", "topic1"),
    ("topic2", "topic2"),
    ("topic3", "topic3"),
]


def _projection() -> list[Column]:
    """O-12 — the projected/renamed response columns (src/api.rs:118-124).
    ``data`` is stored as the 0x… hex string (see schemas.py), so the
    reference's ENCODE(data,'escape') byte→text decode is the identity here.
    (Built lazily: Column construction needs an active session.)"""
    return [
        F.col(src) if src == out else F.col(src).alias(out)
        for src, out in LOGS_PROJECTION
    ]


@dataclass
class GetLogsFilter:
    """Mirror of the request DTO ``GetLogsFilter`` (src/api_models.rs:16-48).

    All fields optional; provided ones AND together.  ``page_size`` accepts
    the reference's ``limit`` alias at the API layer.
    """

    block_hash: str | None = None
    from_block: int | None = None
    to_block: int | None = None
    address: str | None = None
    topic0: str | None = None
    topic1: str | None = None
    topic2: str | None = None
    topic3: str | None = None
    # keyset cursor (preferred)
    cursor_block: int | None = None
    cursor_log_id: int | None = None
    # legacy offset pagination
    page: int | None = None
    page_size: int = DEFAULT_PAGE_SIZE

    @property
    def has_cursor(self) -> bool:
        # src/api.rs:116 — cursor mode engages when EITHER field is set;
        # the missing one defaults to 0 (src/api.rs:165-166).
        return self.cursor_block is not None or self.cursor_log_id is not None

    def clamped_page_size(self) -> int:  # O-19, src/api.rs:115
        return max(1, min(self.page_size, MAX_PAGE_SIZE))

    def clamped_page(self) -> int:  # src/api.rs:178
        return max(1, self.page or 1)


@dataclass
class LogsPage:
    """Response analog of ``LogsResponse`` (src/api_models.rs:61-66)."""

    logs: list[dict]
    next_cursor_block: int | None
    next_cursor_log_id: int | None


def _predicates(flt: GetLogsFilter) -> list[Column]:
    """Conjunctive predicate list in the reference's append order
    (src/api.rs:126-172)."""
    preds: list[Column] = []
    # O-14a: block_hash overrides the from/to range — mutually exclusive
    # branch, exactly like the reference's if/else (src/api.rs:126-139).
    if flt.block_hash is not None:
        preds.append(hex_eq("block_hash", flt.block_hash))  # O-13
    else:
        if flt.from_block is not None:  # O-14
            preds.append(F.col("block_number") >= F.lit(flt.from_block))
        if flt.to_block is not None:
            preds.append(F.col("block_number") <= F.lit(flt.to_block))
    if flt.address is not None:  # O-13 (src/api.rs:140-144)
        preds.append(hex_eq("contract_address", flt.address))
    for i, t in enumerate((flt.topic0, flt.topic1, flt.topic2, flt.topic3)):
        if t is not None:  # O-15 — exact match, independently ANDed
            preds.append(F.col(f"topic{i}") == F.lit(t))
    if flt.has_cursor:
        # O-16 keyset cursor: row-value (block_number, id) > (cb, cl),
        # spelled out since Spark has no tuple comparison.  Both disjuncts
        # are range/eq predicates on scan columns → pushed to parquet.
        cb = F.lit(flt.cursor_block if flt.cursor_block is not None else 0)
        cl = F.lit(flt.cursor_log_id if flt.cursor_log_id is not None else 0)
        preds.append(
            (F.col("block_number") > cb)
            | ((F.col("block_number") == cb) & (F.col("id") > cl))
        )
    return preds


def get_logs(logs: DataFrame, flt: GetLogsFilter) -> DataFrame:
    """Build the logs-page plan (no action).  Total order is
    (block_number ASC, id ASC) — the reference's ORDER BY (src/api.rs:174)
    — and the limit makes Spark plan a distributed top-k
    (TakeOrderedAndProject) rather than a global sort."""
    df = logs
    for p in _predicates(flt):
        df = df.filter(p)
    df = df.select(*_projection()).orderBy(F.asc("block_number"), F.asc("id"))
    size = flt.clamped_page_size()
    if not flt.has_cursor and flt.page is not None:  # O-18 legacy OFFSET path
        df = df.offset((flt.clamped_page() - 1) * size)
    return df.limit(size)  # O-17


def get_logs_from_store(store, flt: GetLogsFilter) -> DataFrame:
    """Planner-style source routing for the store-backed logs surface —
    the analog of Postgres choosing ``idx_logs_address`` over the
    primary B-tree (init.sql:71-74): pick the cheapest physical source
    for the filter, then build the SAME logical page plan over it.

    Routing, in order:
    1. address filter + a fresh ``contract_address``-clustered
       projection → :meth:`TableStore.read_projection` (O(1) clustered
       fragments + LSM delta tail).  A STALE projection degrades to the
       base path instead of failing the query — staleness is a
       maintenance signal, not a read error, at the routing layer.
    2. otherwise the base table with every prunable hint the filter
       implies: block bounds → min/max manifest stats; block_hash /
       address equality → per-fragment blooms.

    Pruning never substitutes for predicates: ``get_logs`` applies the
    full filter over whichever source wins, so routing is a pure
    performance decision and result-identical by construction
    (CI-asserted in test_projections.py).

    A keyset cursor implies ``block_number >= cursor_block`` (the tuple
    predicate's weaker projection), so deep pagination prunes every
    fragment the cursor has already walked past at the MANIFEST tier —
    page N of a 100 TB table scans the fragments at the cursor, not the
    table (CI-asserted in test_store_cursor.py)."""
    eff_from = flt.from_block
    if flt.has_cursor and flt.block_hash is None:
        cb = flt.cursor_block if flt.cursor_block is not None else 0
        eff_from = cb if eff_from is None else max(eff_from, cb)
    df = None
    if flt.address is not None and flt.block_hash is None:
        cands = [
            (name, p)
            for name, p in store.projections("logs").items()
            if p["cluster_by"][0] == "contract_address"
        ]
        has_bounds = eff_from is not None or flt.to_block is not None
        # layout preference mirrors a cost-based index choice: with
        # block bounds a z-order replica prunes BOTH dimensions
        # (min_key/max_key × min/max_block per tile); without them the
        # dedicated key-range layout is strictly tighter on the key
        want = "zorder" if has_bounds else "range"
        cands.sort(key=lambda np: np[1].get("layout", "range") != want)
        for name, p in cands:
            try:
                df = store.read_projection(
                    "logs",
                    name,
                    key_equals=flt.address,
                    min_block=eff_from,
                    max_block=flt.to_block,
                )
            except RuntimeError:
                df = None  # stale projection: try next / fall to base
                continue
            break
    if df is None:
        equals = {}
        if flt.address is not None:
            equals["contract_address"] = flt.address
        if flt.block_hash is not None:
            equals["block_hash"] = flt.block_hash
        if flt.topic0 is not None:
            # topic0 is dictionary-tier (DEFAULT_DICT_COLUMNS): an event
            # signature's per-fragment distinct set prunes exactly, with
            # zero sidecar I/O — the idx_logs_topic0_block shape
            equals["topic0"] = flt.topic0
        df = store.read(
            "logs",
            min_block=eff_from if flt.block_hash is None else None,
            max_block=flt.to_block if flt.block_hash is None else None,
            equals=equals or None,
        )
    return get_logs(df, flt)


def _collect_page(df: DataFrame) -> LogsPage:
    """Execute a prepared page plan and derive the next cursor from the
    LAST returned row (O-20, src/api.rs:186-195).  Collect is bounded
    by MAX_PAGE_SIZE."""
    rows = [r.asDict() for r in df.collect()]
    if rows:
        tail = rows[-1]
        return LogsPage(rows, tail["block_number"], tail["id"])
    return LogsPage(rows, None, None)


def run_get_logs(logs: DataFrame, flt: GetLogsFilter) -> LogsPage:
    return _collect_page(get_logs(logs, flt))


def run_get_logs_from_store(store, flt: GetLogsFilter) -> LogsPage:
    """Store-routed page execution: per-request source routing through
    :func:`get_logs_from_store` (projection pick + manifest min/max /
    bloom / dictionary pruning + cursor-derived fragment pruning), so a
    REST ``POST /logs`` gets the same physical access path the catalog
    entries pin — and reads the CURRENT manifest on every call, like
    the reference's per-request pool query (src/api.rs:184)."""
    return _collect_page(get_logs_from_store(store, flt))
