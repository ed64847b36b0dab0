"""Per-fragment bloom filters — the point-lookup index tier.

The reference serves ``WHERE address = $1`` / ``WHERE hash = $1`` point
lookups from Postgres b-tree indexes (``init.sql:71-74``; README claims
sub-millisecond).  A manifest store has min/max fragment stats instead —
but a hash-like key (contract address, tx hash) is uniformly spread
across block ranges, so min/max prunes NOTHING for these predicates:
every fragment of a 100 TB table would be scanned to find one address.

A small bloom filter per (fragment, column) restores the index tier:

- **build**: at fragment-write time, one column-pruned pyarrow pass over
  the freshly-written parquet collects the distinct keys and sets
  ``k`` bits per key in an ``m``-bit array (``m ≈ 10·n`` → ~0.8 % false
  positives with ``k = 7``).
- **store**: the bitset lives in a *sidecar file inside the fragment
  directory* (``_bloom-<col>.bin``; the leading underscore keeps Spark's
  file listing from treating it as data).  The manifest records only the
  parameters — manifests stay O(#fragments), and a query loads only the
  few-KB sidecars of fragments that survived min/max pruning.
- **probe**: an equality predicate drops every fragment whose bloom
  definitely excludes the key, *before Spark lists a single file*.
  False positives cost a wasted scan of one fragment; false negatives
  cannot happen, so pruning is always safe.

Hashing is double-hashed blake2b (Kirsch–Mitzenmacher: ``h_i = h1 +
i·h2 mod m`` needs one 128-bit digest per key, split into two 64-bit
halves) — stable across processes and Python versions, unlike the
builtin ``hash``.  Keys are normalized to lowercase before hashing on
BOTH build and probe, matching the engine's case-insensitive hex
semantics (``src/api.rs`` lowercases addresses; ``functions/evm.hex_eq``).

Scale note: the build kernel is a per-key Python loop over the distinct
set — bounded by ``max_keys`` (default 1M distinct keys per fragment,
~1.2 MB sidecar).  Fragments are per-ingest-batch or per-compaction-range,
so the distinct count per fragment stays far below the table's; a JVM/
vectorized xxhash build would be the first port if fragment cardinality
ever grows past the cap (the cap degrades to "no bloom, scan as before",
never to wrong results).
"""

from __future__ import annotations

import hashlib
import math
from pathlib import Path
from typing import Iterable

BITS_PER_KEY = 10
NUM_HASHES = 7  # ≈ 0.69 · bits_per_key, the optimal k for m = 10n
MAX_KEYS_DEFAULT = 1_000_000


def _normalize(value) -> bytes:
    """Canonical key bytes: lowercase for strings (case-insensitive hex
    equality is the engine-wide contract), decimal repr for ints."""
    if value is None:
        raise TypeError("bloom keys must be non-NULL")
    if isinstance(value, bytes):
        return value.lower()
    if isinstance(value, str):
        return value.lower().encode("utf-8")
    if isinstance(value, int):
        return str(value).encode("ascii")
    raise TypeError(f"unsupported bloom key type: {type(value).__name__}")


def _hash_pair(key: bytes) -> tuple[int, int]:
    d = hashlib.blake2b(key, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd stride cycles any m
    return h1, h2


def build_bloom(values: Iterable, *, bits_per_key: int = BITS_PER_KEY,
                num_hashes: int = NUM_HASHES) -> tuple[bytes, int, int, int]:
    """Build a bloom bitset over the distinct normalized values.

    Returns ``(bitset, m_bits, k, n_distinct)``.
    """
    keys = {_normalize(v) for v in values if v is not None}
    n = len(keys)
    m = max(64, int(math.ceil(n * bits_per_key / 8.0)) * 8)
    bits = bytearray(m // 8)
    for key in keys:
        h1, h2 = _hash_pair(key)
        for i in range(num_hashes):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bytes(bits), m, num_hashes, n


def might_contain(bitset: bytes, m: int, k: int, value) -> bool:
    """Probe: False ⇒ the key is definitely absent (safe to prune)."""
    h1, h2 = _hash_pair(_normalize(value))
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bitset[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def sidecar_name(column: str) -> str:
    # underscore prefix: Spark/Hadoop listings skip it, so the sidecar
    # can live inside the fragment dir next to its parquet files
    return f"_bloom-{column}.bin"


def write_sidecar(frag_dir: Path, column: str, bitset: bytes) -> None:
    (frag_dir / sidecar_name(column)).write_bytes(bitset)


def read_sidecar(frag_dir: Path, column: str) -> bytes:
    return (frag_dir / sidecar_name(column)).read_bytes()
