"""PySpark-native analytics engine with the capabilities of
``Nihal-Pandey-2302/rust-evm-indexer`` (an EVM event indexer), rebuilt
Spark-first.

The reference normalizes an EVM chain into ``blocks`` / ``transactions`` /
``logs`` relational tables and serves filtered, cursor-paginated queries over
them (see SURVEY.md).  This package re-expresses that surface — plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) — as idiomatic PySpark: declarative DataFrame plans
optimized by Catalyst, a manifest-versioned atomic parquet store standing in
for the reference's PostgreSQL transactions, and Structured-Streaming-shaped
ingest with reorg retraction.

Layout
------
- ``schemas``     explicit StructTypes for every table (never inferred)
- ``session``     SparkSession factory tuned for local[] testing / cluster use
- ``store``       atomic multi-table parquet store (txn manifest, delete, merge)
- ``sources``     batch readers + the mock EVM JSON-RPC chain source
- ``ingest``      normalize / explode / idempotent-commit / reorg rollback
- ``operators``   query-side operators: get_logs, lookups, joins, dedup, ANN…
- ``functions``   column-level helpers (hex normalization, u256, topics)
- ``streaming``   micro-batch ingest loop + windowed event analytics
- ``plans``       plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
