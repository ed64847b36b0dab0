"""Point lookups + telemetry: the reference's remaining API surface.

- :func:`get_block` — ``GET /block/{id}`` polymorphic key dispatch
  (src/api.rs:284-321): ``0x``-prefixed → by block_hash (lowercased),
  else integer → by block_number; None when absent (API maps to 404).
- :func:`get_transaction` — ``GET /transaction/{hash}`` with input
  validation (``0x`` + length 66 → else ValueError ≙ 400;
  src/api.rs:338-388).
- :func:`get_stats` — ``GET /stats``: three COUNT(*)s + checkpoint read +
  lag arithmetic (src/api.rs:242-267).
- :func:`latest_block_hash_at` — the reorg lookup: top-1 by descending
  insertion order at a height (src/db.rs:19-30).
- :func:`read_checkpoint` — checkpoint point read (src/db.rs:8-15).

Point lookups are equality filters on scan columns — Catalyst pushes them
into the parquet/store scan, so at 100 TB a lookup touches only the files
whose min/max stats straddle the key (the file-skipping analog of the
reference's B-tree indexes, SURVEY.md §4 P-1..P-5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datagen import INDEXER_NAME
from ..functions.evm import hex_eq

TX_HASH_LEN = 66  # 0x + 64 hex chars (src/api.rs:341-346)


def parse_block_identifier(identifier: str) -> tuple[str, "str | int"]:
    """Shared key dispatch for the polymorphic block lookup
    (src/api.rs:284-321): ``("hash", lowercased_hash)`` for a
    ``0x``-prefixed identifier, ``("height", n)`` for an integer —
    ValueError otherwise (≙ 400).  One parser for both the Spark path
    and the Arrow serving tier, so validation can never diverge."""
    ident = identifier.strip()
    if ident.lower().startswith("0x"):
        return "hash", ident.lower()
    try:
        return "height", int(ident)
    except ValueError as exc:
        raise ValueError(f"invalid block identifier: {identifier!r}") from exc


def validate_tx_hash(tx_hash: str) -> str:
    """The reference's tx-hash validation (``0x`` + length 66,
    src/api.rs:341-346), shared by both access paths; returns the
    lowercased hash or raises ValueError (≙ 400)."""
    h = tx_hash.strip().lower()
    if not h.startswith("0x") or len(h) != TX_HASH_LEN:
        raise ValueError(f"invalid transaction hash: {tx_hash!r}")
    return h


def get_block(blocks: DataFrame, identifier: str) -> dict | None:
    """Polymorphic block lookup: hash if ``0x``-prefixed, else height.

    Raises ValueError for a non-integer, non-hash identifier (≙ 400).
    """
    kind, key = parse_block_identifier(identifier)
    if kind == "hash":
        pred = hex_eq("block_hash", key)
    else:
        pred = F.col("block_number") == key
    rows = blocks.filter(pred).limit(1).collect()
    return rows[0].asDict() if rows else None


def get_transaction(transactions: DataFrame, tx_hash: str) -> dict | None:
    """Transaction lookup with the reference's input validation."""
    h = validate_tx_hash(tx_hash)
    rows = transactions.filter(hex_eq("tx_hash", h)).limit(1).collect()
    return rows[0].asDict() if rows else None


def latest_block_hash_at(blocks: DataFrame, height: int) -> str | None:
    """Stored hash at a height, latest-written first — the parent-hash
    comparison input for reorg detection.  With multiple rows at one height
    (uncle window) the reference takes the most recently inserted; here the
    max timestamp then hash is the deterministic stand-in."""
    rows = (
        blocks.filter(F.col("block_number") == height)
        .orderBy(F.desc("timestamp"), F.desc("block_hash"))
        .limit(1)
        .select("block_hash")
        .collect()
    )
    return rows[0][0] if rows else None


def read_checkpoint(status: DataFrame, indexer_name: str = INDEXER_NAME) -> int | None:
    rows = (
        status.filter(F.col("indexer_name") == indexer_name)
        .select("last_processed_block")
        .limit(1)
        .collect()
    )
    return rows[0][0] if rows else None


@dataclass
class IndexerStats:
    """Response analog of ``IndexerStats`` (src/api_models.rs:51-58)."""

    total_blocks: int
    total_transactions: int
    total_logs: int
    last_processed_block: int | None
    chain_head: int | None
    ingestion_lag: int | None


def get_stats(
    blocks: DataFrame,
    transactions: DataFrame,
    logs: DataFrame,
    status: DataFrame,
    indexer_name: str = INDEXER_NAME,
) -> IndexerStats:
    """COUNT(*) triple + checkpoint + lag (src/api.rs:243-258).  Parquet
    counts are metadata-only scans (row-group stats), no data read."""
    srow = (
        status.filter(F.col("indexer_name") == indexer_name).limit(1).collect()
    )
    last, head = (
        (srow[0]["last_processed_block"], srow[0]["chain_head_at_last_poll"])
        if srow
        else (None, None)
    )
    lag = (head - last) if head is not None and last is not None else None
    return IndexerStats(
        total_blocks=blocks.count(),
        total_transactions=transactions.count(),
        total_logs=logs.count(),
        last_processed_block=last,
        chain_head=head,
        ingestion_lag=lag,
    )
