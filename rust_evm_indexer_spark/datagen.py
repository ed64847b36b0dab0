"""Deterministic EVM-shaped fixture generator (FIXTURES.md §A).

Synthesizes a consistent chain — blocks → transactions → logs plus an
``indexer_status`` row — with the edge cases the reference's semantics
require for testing:

- one height with TWO block rows (uncle; PK is block_hash, not height —
  ``init.sql:12``);
- empty blocks (0 txs) and plain-transfer txs (no logs);
- NULL-rate topics increasing t1→t3 and some logs with only topic0;
- skewed ``contract_address`` / ``topic0`` (one ERC-20-ish contract and the
  Transfer signature dominate, like mainnet);
- ``logs.id`` = dense rank of (block_number, tx_index, log_index) — the
  deterministic BIGSERIAL stand-in that cursor tests depend on.

A separate :func:`generate_fork` builds a competing branch for reorg tests
(parent-hash mismatch at the fork height, invariant of ``src/db.rs:34-50``).

Pure Python + pyarrow — fast enough to run per test session; parquet written
by :func:`write_fixtures` is read back through the explicit schemas in
``schemas.py``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

TRANSFER_SIG = "0x" + "dd" * 32  # stand-in for the ERC-20 Transfer topic0
START_BLOCK = 1_000_000
INDEXER_NAME = "evm_main_sync"  # src/db.rs:5


def _hex(rng: random.Random, nbytes: int) -> str:
    return "0x" + "".join(rng.choice("0123456789abcdef") for _ in range(nbytes * 2))


@dataclass
class Chain:
    blocks: list[dict] = field(default_factory=list)
    transactions: list[dict] = field(default_factory=list)
    logs: list[dict] = field(default_factory=list)
    status: list[dict] = field(default_factory=list)

    def tables(self) -> dict[str, list[dict]]:
        return {
            "blocks": self.blocks,
            "transactions": self.transactions,
            "logs": self.logs,
            "indexer_status": self.status,
        }


def generate_chain(
    n_blocks: int = 60,
    seed: int = 42,
    start_block: int = START_BLOCK,
    max_txs_per_block: int = 12,
) -> Chain:
    rng = random.Random(seed)
    addr_pool = [_hex(rng, 20) for _ in range(50)]
    contract_pool = [_hex(rng, 20) for _ in range(20)]
    topic0_pool = [TRANSFER_SIG] + [_hex(rng, 32) for _ in range(4)]
    chain = Chain()

    parent = _hex(rng, 32)
    log_id = 0
    base_ts = 1_700_000_000
    uncle_height = start_block + n_blocks // 3  # one duplicated height

    for i in range(n_blocks):
        height = start_block + i
        block_hash = _hex(rng, 32)
        gas_limit = 30_000_000
        gas_used = rng.randint(0, gas_limit)
        block = {
            "block_hash": block_hash,
            "block_number": height,
            "parent_hash": parent,
            "timestamp": base_ts + 12 * i,
            "gas_used": str(gas_used),
            "gas_limit": str(gas_limit),
            "base_fee_per_gas": None if rng.random() < 0.05 else str(rng.randint(10**9, 10**11)),
        }
        chain.blocks.append(block)
        if height == uncle_height:
            # uncle: same height + parent, different hash; no children rows
            chain.blocks.append({**block, "block_hash": _hex(rng, 32)})

        # skewed tx count, ~15% empty blocks
        n_txs = 0 if rng.random() < 0.15 else rng.randint(1, max_txs_per_block)
        for t in range(n_txs):
            tx_hash = _hex(rng, 32)
            legacy = rng.random() < 0.4
            status = None if rng.random() < 0.01 else (0 if rng.random() < 0.03 else 1)
            is_creation = rng.random() < 0.02
            tx = {
                "tx_hash": tx_hash,
                "block_number": height,
                "block_hash": block_hash,
                "transaction_index": t,
                "from_address": rng.choice(addr_pool),
                "to_address": None if is_creation else rng.choice(addr_pool),
                "value": str(rng.choice([0, 0, rng.randint(1, 10**19)])),
                "gas_price": str(rng.randint(10**9, 10**11)) if legacy else None,
                "max_fee_per_gas": None if legacy else str(rng.randint(10**9, 10**11)),
                "max_priority_fee_per_gas": None if legacy else str(rng.randint(10**8, 10**9)),
                "gas_provided": str(rng.randint(21_000, 500_000)),
                "input_data": "0x" if rng.random() < 0.4 else _hex(rng, 4 + 32 * rng.randint(0, 3)),
                "status": status,
            }
            chain.transactions.append(tx)

            n_logs = 0 if tx["input_data"] == "0x" else rng.randint(0, 3)
            for li in range(n_logs):
                # topic NULL rates per FIXTURES.md: t1 ~20%, t2 ~40%, t3 ~90%
                topic0 = topic0_pool[0] if rng.random() < 0.6 else rng.choice(topic0_pool)
                topics = [topic0]
                for null_rate in (0.2, 0.4, 0.9):
                    if rng.random() < null_rate:
                        break
                    topics.append("0x" + rng.choice(addr_pool)[2:].rjust(64, "0"))
                contract = (
                    contract_pool[0] if rng.random() < 0.5 else rng.choice(contract_pool)
                )
                chain.logs.append(
                    {
                        "id": log_id,
                        "log_index_in_tx": li,
                        "transaction_hash": tx_hash,
                        "transaction_index_in_block": t,
                        "block_number": height,
                        "block_hash": block_hash,
                        "contract_address": contract,
                        "data": "0x" + "00" * 31 + "2a",
                        "topic0": topics[0],
                        "topic1": topics[1] if len(topics) > 1 else None,
                        "topic2": topics[2] if len(topics) > 2 else None,
                        "topic3": topics[3] if len(topics) > 3 else None,
                        "all_topics": topics,
                    }
                )
                log_id += 1
        parent = block_hash

    tip = start_block + n_blocks - 1
    chain.status.append(
        {
            "indexer_name": INDEXER_NAME,
            "last_processed_block": tip,
            "chain_head_at_last_poll": tip + 3,  # lag > 0 for /stats
        }
    )
    return chain


def generate_fork(chain: Chain, fork_depth: int = 3, seed: int = 7) -> Chain:
    """Competing branch replacing the last ``fork_depth`` blocks at the tip."""
    tip = max(b["block_number"] for b in chain.blocks)
    return generate_fork_at(chain, tip, fork_depth, seed)


def generate_fork_at(
    chain: Chain, tip: int, fork_depth: int = 3, seed: int = 7
) -> Chain:
    """A competing branch replacing the ``fork_depth`` blocks below ``tip``
    (inclusive), one block longer than what it replaces.

    Its first block's parent_hash equals the canonical hash at
    (tip − fork_depth), so ingesting it triggers the parent-mismatch reorg
    path (analog of ``src/main.rs:166-189``).
    """
    rng = random.Random(seed)
    canonical = sorted(
        (b for b in chain.blocks if b["block_number"] <= tip),
        key=lambda b: b["block_number"],
    )
    fork_base_height = tip - fork_depth
    # canonical row at the fork base = the one the next height points at
    # (skips the uncle row if the base height happens to be duplicated)
    child_parents = {
        b["parent_hash"] for b in canonical if b["block_number"] == fork_base_height + 1
    }
    candidates = [b for b in canonical if b["block_number"] == fork_base_height]
    base = next(
        (b for b in candidates if b["block_hash"] in child_parents), candidates[0]
    )
    fork = Chain()
    parent = base["block_hash"]
    for i in range(fork_depth + 1):
        height = fork_base_height + 1 + i
        block_hash = _hex(rng, 32)
        fork.blocks.append(
            {
                "block_hash": block_hash,
                "block_number": height,
                "parent_hash": parent,
                "timestamp": base["timestamp"] + 12 * (i + 1),
                "gas_used": str(rng.randint(0, 30_000_000)),
                "gas_limit": "30000000",
                "base_fee_per_gas": str(rng.randint(10**9, 10**11)),
            }
        )
        tx_hash = _hex(rng, 32)
        fork.transactions.append(
            {
                "tx_hash": tx_hash,
                "block_number": height,
                "block_hash": block_hash,
                "transaction_index": 0,
                "from_address": _hex(rng, 20),
                "to_address": _hex(rng, 20),
                "value": "1",
                "gas_price": "1000000000",
                "max_fee_per_gas": None,
                "max_priority_fee_per_gas": None,
                "gas_provided": "21000",
                "input_data": "0x",
                "status": 1,
            }
        )
        parent = block_hash
    return fork


# --- parquet I/O ---------------------------------------------------------

_ARROW_SCHEMAS = {
    "blocks": pa.schema(
        [
            ("block_hash", pa.string()),
            ("block_number", pa.int64()),
            ("parent_hash", pa.string()),
            ("timestamp", pa.int64()),
            ("gas_used", pa.string()),
            ("gas_limit", pa.string()),
            ("base_fee_per_gas", pa.string()),
        ]
    ),
    "transactions": pa.schema(
        [
            ("tx_hash", pa.string()),
            ("block_number", pa.int64()),
            ("block_hash", pa.string()),
            ("transaction_index", pa.int64()),
            ("from_address", pa.string()),
            ("to_address", pa.string()),
            ("value", pa.string()),
            ("gas_price", pa.string()),
            ("max_fee_per_gas", pa.string()),
            ("max_priority_fee_per_gas", pa.string()),
            ("gas_provided", pa.string()),
            ("input_data", pa.string()),
            ("status", pa.int16()),
        ]
    ),
    "logs": pa.schema(
        [
            ("id", pa.int64()),
            ("log_index_in_tx", pa.int64()),
            ("transaction_hash", pa.string()),
            ("transaction_index_in_block", pa.int64()),
            ("block_number", pa.int64()),
            ("block_hash", pa.string()),
            ("contract_address", pa.string()),
            ("data", pa.string()),
            ("topic0", pa.string()),
            ("topic1", pa.string()),
            ("topic2", pa.string()),
            ("topic3", pa.string()),
            ("all_topics", pa.list_(pa.string())),
        ]
    ),
    "indexer_status": pa.schema(
        [
            ("indexer_name", pa.string()),
            ("last_processed_block", pa.int64()),
            ("chain_head_at_last_poll", pa.int64()),
        ]
    ),
}


def to_arrow(name: str, rows: list[dict]) -> pa.Table:
    schema = _ARROW_SCHEMAS[name]
    return pa.Table.from_pylist(rows, schema=schema)


def write_fixtures(outdir: str | Path, chain: Chain | None = None) -> Path:
    """Write the chain as one parquet file per table under ``outdir``."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    chain = chain or generate_chain()
    for name, rows in chain.tables().items():
        pq.write_table(to_arrow(name, rows), outdir / f"{name}.parquet")
    return outdir


def write_u256_fixture(outdir: str | Path, *, seed: int = 97) -> Path:
    """Deterministic U256 value-transfer fixture whose per-address sums
    STRADDLE 10^38 — the regime where the single-limb DECIMAL(38,0)
    contract (functions/evm.py::u256_to_decimal) drops values as NULL
    and only the 4-limb exact path (u256_limbs +
    u256_string_from_limb_sums) keeps every wei.  Magnitudes are drawn
    log-uniformly from dust (10^5) through full 78-digit U256, plus a
    NULL and a zero per address, so the catalog oracle exercises carry
    propagation across every limb boundary."""
    rng = random.Random(seed)
    rows: list[dict] = []
    addresses = [f"0x{a:040x}" for a in range(0xA0, 0xA6)]
    mags = [5, 18, 19, 37, 38, 39, 56, 57, 75, 77, 78]
    for addr in addresses:
        for i, mag in enumerate(mags * 3):
            hi = min(10**mag, 2**256)
            rows.append(
                {"from_address": addr, "value": str(rng.randrange(hi // 10, hi))}
            )
        rows.append({"from_address": addr, "value": "0"})
        rows.append({"from_address": addr, "value": None})
    schema = pa.schema([("from_address", pa.string()), ("value", pa.string())])
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), outdir / "values.parquet")
    return outdir


def write_clustered_embeddings(
    outdir: str | Path,
    *,
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 8,
    spread: float = 0.06,
    seed: int = 11,
) -> Path:
    """Mixture-of-Gaussians embeddings — the CLUSTERED regime real text
    embeddings live in (VERDICT r7 item 3).  The driver's synthetic
    embeddings are ~uniform on the unit sphere (residual norm ratio
    0.965), where residual/OPQ encodings provably cannot help; real
    encoder outputs concentrate on topical clusters (ratio 0.3–0.7),
    which is the regime those encodings exist for.  Each vector is
    normalize(center_c + spread·N(0, I)) with unit-vector centers; the
    per-coordinate noise scale aggregates over dim, so the residual
    ratio is ≈ spread·√dim / √(1 + spread²·dim) — 0.06 at dim=64 gives
    the ≈0.45 mid-band of real encoder outputs.  Same schema as
    the driver's embeddings table (vec_id, embedding float32, label =
    the generating cluster, usable as ground truth)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n)
    X = centers[labels] + spread * rng.standard_normal((n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in X[i]],
         "label": int(labels[i])}
        for i in range(n)
    ]
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        outdir / "embeddings.parquet",
    )
    return outdir


if __name__ == "__main__":
    import sys

    out = write_fixtures(sys.argv[1] if len(sys.argv) > 1 else "tests/_fixtures/evm")
    print(f"wrote fixtures to {out}")
