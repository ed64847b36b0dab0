"""Arrow latency tier (serving.py): property-tested equivalence with
the Spark route, plus the no-Spark-job guarantee.

The serving tier re-executes the API's point/page requests via
manifest-pruned pyarrow scans.  Its whole correctness story is "same
page as the Spark path, always" — so the core test here drives a
seeded sweep of randomized filters (ranges, hex equalities, topics,
cursors, legacy pages, hash-overrides-range, absent keys) through BOTH
paths over a multi-fragment store with the default dict/bloom tiers
and a clustered projection (so the Spark route exercises projection
routing while the Arrow route prunes the base table — result-identical
by construction or this fails)."""

from __future__ import annotations

import random

import pytest

from rust_evm_indexer_spark.operators.logs import (
    GetLogsFilter,
    run_get_logs_from_store,
)
from rust_evm_indexer_spark.serving import ArrowServing
from rust_evm_indexer_spark.store import TableStore


@pytest.fixture(scope="module")
def served_store(spark, evm, tmp_path_factory):
    """Multi-fragment store (3 block-range commits) with default
    index tiers and an address projection — the physical layout where
    pruning decisions actually differ between fragments."""
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("serving_store")
    store = TableStore(spark, root)  # default bloom/dict tiers
    blocks = evm["blocks"]
    bounds = [r[0] for r in blocks.select("block_number").collect()]
    lo, hi = min(bounds), max(bounds)
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    for a, b in ((lo, cut1), (cut1 + 1, cut2), (cut2 + 1, hi)):
        rng = (F.col("block_number") >= a) & (F.col("block_number") <= b)
        store.commit({
            "blocks": evm["blocks"].filter(rng),
            "transactions": evm["transactions"].filter(rng),
            "logs": evm["logs"].filter(rng),
        })
    store.build_projection(
        "logs", "by_addr", ("contract_address",), max_fragments=2
    )
    return store


def _sample_values(spark_df, col, n=4, seed=0):
    rows = spark_df.select(col).where(f"{col} is not null").distinct().limit(
        50
    ).collect()
    rng = random.Random(seed)
    vals = [r[0] for r in rows]
    rng.shuffle(vals)
    return vals[:n]


@pytest.mark.slow
def test_logs_page_equivalence_randomized(served_store, evm):
    """Seeded sweep: every filter combination must produce the
    identical page (rows AND cursor) on both execution paths."""
    serving = ArrowServing(served_store)
    addrs = _sample_values(evm["logs"], "contract_address", seed=1)
    topics = _sample_values(evm["logs"], "topic0", seed=2)
    hashes = _sample_values(evm["logs"], "block_hash", 2, seed=3)
    row = evm["logs"].selectExpr(
        "min(block_number) a", "max(block_number) b"
    ).collect()[0]
    lo, hi = row["a"], row["b"]
    rng = random.Random(42)

    def maybe(v, p=0.5):
        return v if rng.random() < p else None

    cases = []
    for _ in range(40):
        span = rng.randint(0, hi - lo)
        start = rng.randint(lo, hi - span)
        f = GetLogsFilter(
            block_hash=maybe(rng.choice(hashes + ["0x" + "9" * 64]), 0.15),
            from_block=maybe(start, 0.5),
            to_block=maybe(start + span, 0.5),
            address=maybe(rng.choice(addrs + [addrs[0].upper()]), 0.5),
            topic0=maybe(rng.choice(topics), 0.4),
            cursor_block=maybe(rng.randint(lo, hi), 0.3),
            cursor_log_id=maybe(rng.randint(0, 5000), 0.3),
            page=maybe(rng.randint(1, 3), 0.2),
            page_size=rng.choice([1, 7, 25, 100, 500]),
        )
        if f.has_cursor:
            f.page = None  # cursor wins; keep the case well-formed
        cases.append(f)
    # plus the boundary shapes a sweep can miss
    cases += [
        GetLogsFilter(),  # first page, defaults
        GetLogsFilter(page_size=100, page=2),
        GetLogsFilter(from_block=lo, to_block=lo),
        GetLogsFilter(address="0x" + "0" * 40),  # absent key
        GetLogsFilter(cursor_block=hi, cursor_log_id=10**9),  # past the end
    ]
    for i, flt in enumerate(cases):
        spark_page = run_get_logs_from_store(served_store, flt)
        arrow_page = serving.get_logs_page(flt)
        assert arrow_page.logs == spark_page.logs, (i, flt)
        assert (
            arrow_page.next_cursor_block,
            arrow_page.next_cursor_log_id,
        ) == (
            spark_page.next_cursor_block,
            spark_page.next_cursor_log_id,
        ), (i, flt)


def test_point_lookup_equivalence(served_store, evm):
    from rust_evm_indexer_spark.operators.lookups import (
        get_block,
        get_transaction,
    )

    serving = ArrowServing(served_store)
    blocks_df = served_store.read("blocks")
    tx_df = served_store.read("transactions")

    heights = [r[0] for r in evm["blocks"].select("block_number")
               .groupBy("block_number").count().where("count = 1")
               .limit(5).collect()]
    for h in heights:
        assert serving.get_block(str(h)) == get_block(blocks_df, str(h))
    # by hash (unique by construction), mixed case in
    bh = evm["blocks"].select("block_hash").first()[0]
    assert serving.get_block(bh.upper()) == get_block(blocks_df, bh.upper())
    # absent + invalid
    assert serving.get_block("99999999") is None
    with pytest.raises(ValueError):
        serving.get_block("not-a-number")

    th = evm["transactions"].select("tx_hash").first()[0]
    assert serving.get_transaction(th) == get_transaction(tx_df, th)
    assert serving.get_transaction("0x" + "f" * 64) is None
    with pytest.raises(ValueError):
        serving.get_transaction("abc")


def test_serving_launches_no_spark_job(served_store, monkeypatch):
    """The latency tier must never touch the Spark session: block every
    DataFrame construction on the store and serve anyway."""
    serving = ArrowServing(served_store)

    def boom(*a, **kw):  # noqa: ANN001
        raise AssertionError("serving tier called TableStore.read (Spark)")

    monkeypatch.setattr(served_store, "read", boom)
    monkeypatch.setattr(served_store, "read_projection", boom)
    page = serving.get_logs_page(GetLogsFilter(page_size=5))
    assert len(page.logs) == 5
    assert serving.get_block(str(page.logs[0]["block_number"])) is not None


def test_api_fast_path_wiring(served_store):
    """EvmApi.from_store defaults to the latency tier for /logs, /block
    and /transaction; fast=False routes through Spark; both give the
    same envelope."""
    from rust_evm_indexer_spark.api import EvmApi

    fast = EvmApi.from_store(served_store)
    slow = EvmApi.from_store(served_store, fast=False)
    assert fast._serving is not None and slow._serving is None
    body = {"pageSize": 3}
    assert fast.post_logs(body) == slow.post_logs(body)
    n = fast.post_logs(body)["logs"][0]["blockNumber"]
    assert fast.get_block(str(n)) == slow.get_block(str(n))
    assert fast.get_stats() == slow.get_stats()


def test_scan_schema_evolution_parity(spark, tmp_path):
    """r12 review: the Spark route applies the MANIFEST schema, so a
    row from a pre-evolution fragment carries the evolved column as
    null — the Arrow tier must return the identical dict (key present,
    None), never a missing key.  (A neutral table name: the canonical
    EVM tables carry static DDL schemas that would reject this
    evolution.)"""
    import pyarrow.dataset as pa_ds

    store = TableStore(spark, tmp_path / "evo")
    store.commit({
        "t": spark.createDataFrame(
            [(1, "0x" + "a" * 64)], "block_number long, h string"
        )
    })
    store.commit({
        "t": spark.createDataFrame(
            [(2, "0x" + "b" * 64, 77)],
            "block_number long, h string, quality long",
        )
    })
    serving = ArrowServing(store)
    spark_rows = {
        r["block_number"]: r.asDict() for r in store.read("t").collect()
    }
    for n in (1, 2):
        arrow_rows = serving._scan(
            "t",
            pa_filter=pa_ds.field("block_number") == n,
            columns=None,
            min_block=n,
            max_block=n,
            stop_after=1,
        )
        assert arrow_rows == [spark_rows[n]], n
        assert "quality" in arrow_rows[0], n


def test_scan_retries_once_after_vacuum_reclaim(spark, tmp_path):
    """A fragment reclaimed between a request's CURRENT resolution and
    its read (the reader-grace contract) retries against the fresh
    manifest instead of surfacing a 500."""
    import pyarrow.dataset as pa_ds

    store = TableStore(spark, tmp_path / "retry")
    store.commit({
        "t": spark.createDataFrame(
            [(1, "a"), (2, "b")], "block_number long, v string"
        )
    })
    serving = ArrowServing(store)
    calls = {"n": 0}
    real = serving._scan_once

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError("fragment reclaimed mid-scan")
        return real(*a, **kw)

    serving._scan_once = flaky
    rows = serving._scan(
        "t", pa_filter=pa_ds.field("block_number") == 2, columns=None,
        min_block=2, max_block=2, stop_after=1,
    )
    assert [r["v"] for r in rows] == ["b"] and calls["n"] == 2
    # two consecutive failures propagate
    calls["n"] = -1  # both attempts raise
    serving._scan_once = lambda *a, **kw: (_ for _ in ()).throw(
        FileNotFoundError("still gone")
    )
    with pytest.raises(FileNotFoundError):
        serving._scan("t", pa_filter=None, columns=None)


def test_serving_reads_stable_under_compaction_and_vacuum(spark, tmp_path):
    """Chaos leg for the latency tier: Arrow page/point reads loop while
    a committer, a compactor and an adversarial grace-zero vacuum churn
    the store.  Counts are compaction-invariant, so every successful
    read stays monotone; the bounded reclaim-retry absorbs the
    reader-grace transients; final page exact."""
    import threading

    store = TableStore(spark, tmp_path / "chaos")
    rows = 5

    def batch(b):
        return spark.createDataFrame(
            [(b * 100 + i, f"0x{b:02x}{i:02x}", 100 + b) for i in range(rows)],
            "id long, contract_address string, block_number long",
        )

    store.commit({"t": batch(0)})
    stop = threading.Event()
    failures: list[BaseException] = []
    per_writer = 6

    def writer():
        w = TableStore(spark, tmp_path / "chaos")
        try:
            for a in range(per_writer):
                w.commit_with_retry({"t": batch(1 + a)}, max_attempts=32)
        except BaseException as e:  # noqa: BLE001
            failures.append(e)
        finally:
            stop.set()

    def compactor():
        c = TableStore(spark, tmp_path / "chaos")
        try:
            while not stop.is_set():
                try:
                    c.compact("t", max_fragments=2)
                except RuntimeError as e:
                    if "concurrent commit" not in str(e) and \
                            "forfeited" not in str(e) and \
                            "claimed by" not in str(e):
                        raise
        except BaseException as e:  # noqa: BLE001
            failures.append(e)

    def sweeper():
        s = TableStore(spark, tmp_path / "chaos")
        try:
            while not stop.is_set():
                s.vacuum(grace_seconds=0, keep_manifests=200)
        except BaseException as e:  # noqa: BLE001
            failures.append(e)

    def arrow_reader():
        serving = ArrowServing(TableStore(spark, tmp_path / "chaos"))
        import pyarrow.dataset as pa_ds

        last = 0
        try:
            while not stop.is_set():
                try:
                    got = serving._scan(
                        "t", pa_filter=pa_ds.field("id") >= 0, columns=["id"]
                    )
                except (FileNotFoundError, OSError):
                    # two consecutive reclaims under churn — legal per
                    # the reader-grace contract; the dedicated retry
                    # test pins the single-retry behavior
                    continue
                n = len(got)
                assert n >= last and n % rows == 0, (n, last)
                last = n
        except BaseException as e:  # noqa: BLE001
            failures.append(e)

    threads = [threading.Thread(target=f)
               for f in (writer, compactor, sweeper, arrow_reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not failures, failures
    final = ArrowServing(TableStore(spark, tmp_path / "chaos"))
    import pyarrow.dataset as pa_ds

    got = final._scan("t", pa_filter=pa_ds.field("id") >= 0, columns=["id"])
    assert len(got) == rows * (1 + per_writer)


def test_hot_key_falls_back_to_spark_route(spark, tmp_path):
    """r12 review: a hot address surviving bloom pruning in more
    fragments than the latency tier should scan in-process raises
    ServingFallback, and the API layer serves the identical page via
    the Spark route (projection routing's home turf)."""
    from rust_evm_indexer_spark.api import EvmApi
    from rust_evm_indexer_spark.serving import ServingFallback

    store = TableStore(spark, tmp_path / "hot")
    hot = "0x" + "ab" * 20
    for b in range(4):
        store.commit({
            "logs": spark.createDataFrame(
                [(b * 10 + i, hot, 100 + b, i, f"0xt{b}{i}", i,
                  "0xbh", "0x00", None, None, None, None)
                 for i in range(3)],
                "id long, contract_address string, block_number long, "
                "log_index_in_tx long, transaction_hash string, "
                "transaction_index_in_block long, block_hash string, "
                "data string, topic0 string, topic1 string, "
                "topic2 string, topic3 string",
            )
        })
    serving = ArrowServing(store, max_fragments=2)
    flt = GetLogsFilter(address=hot, page_size=5)
    with pytest.raises(ServingFallback):
        serving.get_logs_page(flt)
    # under the cutoff the same request serves in-process
    assert len(ArrowServing(store).get_logs_page(flt).logs) == 5

    api = EvmApi.from_store(store)
    api._serving.max_fragments = 2
    spark_page = run_get_logs_from_store(store, flt)
    body = api.post_logs({"address": hot, "pageSize": 5})
    assert [r["id"] for r in body["logs"]] == [
        r["id"] for r in spark_page.logs
    ]
