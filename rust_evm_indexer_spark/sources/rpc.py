"""Mock EVM JSON-RPC chain source.

Stands in for the reference's ethers provider (``src/main.rs:96-164``):
``get_block_number`` / ``get_block_with_txs`` / ``get_transaction_receipt``
over a deterministic in-memory chain built by ``datagen``.  Values arrive
already typed the way a real connector would deliver them after quantity
decoding (ints for heights/timestamps, decimal strings for U256) — the
hex→U256 parse is a connector/boundary concern in the reference too
(ethers parses, ``src/db.rs`` stringifies), never engine work.

Test hooks:
- ``advance_head(k)`` reveals more of the chain to the poller;
- ``schedule_reorg(depth)`` replaces the visible tail with a competing
  branch (parent-hash mismatch at the fork → exercises O-10/O-11);
- ``inject_failures(n)`` makes the next *n* RPC calls raise
  :class:`TransientRpcError` (exercises the O-4 retry/backoff path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .. import datagen


class TransientRpcError(RuntimeError):
    """A retryable RPC failure (timeout / rate limit)."""


@dataclass
class MockRpcClient:
    chain: datagen.Chain
    head: int | None = None  # visible head; None ⇒ chain tip
    calls: int = 0
    _fail_budget: int = 0
    _by_height: dict[int, dict] = field(default_factory=dict, repr=False)
    _txs_by_block: dict[str, list[dict]] = field(default_factory=dict, repr=False)
    _logs_by_tx: dict[str, list[dict]] = field(default_factory=dict, repr=False)

    def __post_init__(self) -> None:
        self._reindex()
        if self.head is None:
            self.head = max(self._by_height)

    def _reindex(self) -> None:
        self._by_height.clear()
        self._txs_by_block.clear()
        self._logs_by_tx.clear()
        child_parents = {b["parent_hash"] for b in self.chain.blocks}
        tip = max(b["block_number"] for b in self.chain.blocks)
        for b in self.chain.blocks:
            h = b["block_number"]
            # canonical row at a duplicated height = the one a child points
            # at (uncles are visible in storage, never served by RPC)
            if h in self._by_height:
                if b["block_hash"] in child_parents or h == tip:
                    self._by_height[h] = b
            else:
                self._by_height[h] = b
        for t in self.chain.transactions:
            self._txs_by_block.setdefault(t["block_hash"], []).append(t)
        for lg in self.chain.logs:
            self._logs_by_tx.setdefault(lg["transaction_hash"], []).append(lg)

    # -- failure injection -------------------------------------------------

    def inject_failures(self, n: int) -> None:
        self._fail_budget = n

    def _maybe_fail(self) -> None:
        self.calls += 1
        if self._fail_budget > 0:
            self._fail_budget -= 1
            raise TransientRpcError("injected transient failure")

    # -- RPC surface -------------------------------------------------------

    def get_block_number(self) -> int:
        self._maybe_fail()
        return self.head

    def get_block_with_txs(self, number: int) -> dict | None:
        """Nested block dict: header fields + ``transactions`` list
        (receipts are fetched separately, mirroring the N+1 pattern the
        reference acknowledges at README.md:90)."""
        self._maybe_fail()
        if number > self.head:
            return None
        b = self._by_height.get(number)
        if b is None:
            return None
        txs = sorted(
            self._txs_by_block.get(b["block_hash"], []),
            key=lambda t: t["transaction_index"] or 0,
        )
        return {
            "hash": b["block_hash"],
            "number": b["block_number"],
            "parent_hash": b["parent_hash"],
            "timestamp": b["timestamp"],
            "gas_used": b["gas_used"],
            "gas_limit": b["gas_limit"],
            "base_fee_per_gas": b["base_fee_per_gas"],
            "transactions": [
                {
                    "hash": t["tx_hash"],
                    "transaction_index": t["transaction_index"],
                    "from": t["from_address"],
                    "to": t["to_address"],
                    "value": t["value"],
                    "gas_price": t["gas_price"],
                    "max_fee_per_gas": t["max_fee_per_gas"],
                    "max_priority_fee_per_gas": t["max_priority_fee_per_gas"],
                    "gas": t["gas_provided"],
                    "input": t["input_data"],
                }
                for t in txs
            ],
        }

    def get_transaction_receipt(self, tx_hash: str) -> dict | None:
        self._maybe_fail()
        tx = next((t for t in self.chain.transactions if t["tx_hash"] == tx_hash), None)
        if tx is None:
            return None
        logs = sorted(
            self._logs_by_tx.get(tx_hash, []),
            key=lambda lg: lg["log_index_in_tx"] or 0,
        )
        return {
            "transaction_hash": tx_hash,
            "status": tx["status"],
            "logs": [
                {
                    "log_index": lg["log_index_in_tx"],
                    "address": lg["contract_address"],
                    "data": lg["data"],
                    "topics": lg["all_topics"],
                }
                for lg in logs
            ],
        }

    # -- chain mutation hooks ---------------------------------------------

    def advance_head(self, k: int) -> int:
        self.head = min(self.head + k, max(self._by_height))
        return self.head

    def schedule_reorg(self, depth: int = 3, seed: int = 7) -> datagen.Chain:
        """Replace the tail (last ``depth`` visible blocks) with a competing
        branch one block longer; RPC now serves the new branch."""
        fork = datagen.generate_fork_at(self.chain, self.head, depth, seed)
        keep_blocks = [
            b
            for b in self.chain.blocks
            if b["block_number"] <= self.head - depth
        ]
        keep_hashes = {b["block_hash"] for b in keep_blocks}
        self.chain = datagen.Chain(
            blocks=keep_blocks + fork.blocks,
            transactions=[
                t for t in self.chain.transactions if t["block_hash"] in keep_hashes
            ]
            + fork.transactions,
            logs=[lg for lg in self.chain.logs if lg["block_hash"] in keep_hashes]
            + fork.logs,
            status=self.chain.status,
        )
        self._reindex()
        self.head = max(self._by_height)
        return fork
