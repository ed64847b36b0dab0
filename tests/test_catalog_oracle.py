"""Local replay of the driver's correctness gate: every catalog entry's
Spark result must match its DuckDB oracle at sf0.01 (row count + column
names + order-insensitive values)."""

from __future__ import annotations

import pytest

from rust_evm_indexer_spark.catalog import CATALOG

from compare import assert_frames_match
from conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_entry_matches_oracle(spark, duck, name):
    entry = CATALOG[name]
    got = entry.fn(spark, str(SF_ORACLE))
    if entry.oracle is None:
        assert got.count() >= 0  # rows-only check, mirrors the driver
        return
    assert_frames_match(got, duck.execute(entry.oracle).df(), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


# Round-5 out-of-window set: every name here holds a green driver row
# from a PREVIOUS round (r3 unless noted) and was deliberately rotated
# out of the 50-entry window to make room for staler entries.  Pinning
# the set makes window reorders EXPLICIT: adding a catalog entry or
# reshuffling _DRIVER_PRIORITY must consciously update this list, so
# external driver coverage can never be dropped silently (ADVICE r3).
#
# ROUND-6 ROTATION PLAN (the freshness math changed at 113 entries):
# a strict "nothing older than 2 rounds" needs 113/2 ≈ 57 checks/round
# — more than the 50-slot window, so the cycle is now ~2.5 rounds by
# construction.  r6 priorities, in order: (1) the r3-green tail below —
# 3 rounds stale at r6, drain it COMPLETELY (~28 entries); (2) shrink
# the always-in flagship block to the 6 core log/point entries to make
# room; (3) back-fill with the oldest r4-green names at the top of this
# set.  The r5-green window entries can all sit out r6 safely.
_EXPECTED_OUT_OF_WINDOW = {
    # r4-green, 1 round old at r5 — rotated out to promote the
    # 3-round-stale r2 cohort and the never-driver-checked entries;
    # back-fill material for r6 AFTER the r3-green tail is drained
    "multimodal_meta", "window_running_sum", "window_lag_delta",
    "pivot_order_status", "approx_distinct_users", "store_compacted_logs",
    "store_tx_bloom_lookup", "store_projection_logs", "semantic_dedup",
    "bm25_search", "repetition_signals", "substring_dup",
    "source_mix_weights", "skew_salted_topk", "events_gapfill_locf",
    "graph_triangle_count",
    "q1_pricing_summary", "q3_shipping_priority", "q4_priority_check",
    "q5_local_supplier", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q12_late_shipments", "q17_small_qty_avg", "q18_large_orders",
    "q20_excess_sellers",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_cosine", "dedup_embedding_lsh", "similarity_ivf_topk",
    # r3-green tail, 2 rounds old at r5 — the staleness ceiling; the r6
    # window must drain these before any r4-green re-check
    "multimodal_resize", "multimodal_frames", "evm_block_activity",
    "pack_sequences", "decontaminate_ngram", "evm_address_activity",
    "gopher_quality",
    "unigram_nll", "similarity_ivf_knn_join",
    "lang_id", "quality_score", "doc_fingerprint", "window_topk_per_group",
    "events_sessionize", "events_sliding_rollup", "rollup_orders",
    "cube_lineitem", "distinct_agg", "set_ops_customers",
    "semi_join_exists", "anti_join_not_exists", "asof_join_events",
    "range_join_events", "median_per_type", "orders_monthly",
    "dedup_survivors", "json_extract_props", "json_agg_by_key",
}


def test_driver_window_drop_list():
    """The driver verifies exactly the first 50 catalog entries; every
    entry outside that window must be on the explicit, reviewed drop
    list above — no silent loss of external verification coverage."""
    from rust_evm_indexer_spark.catalog import _DRIVER_PRIORITY

    in_window = set(_DRIVER_PRIORITY)
    assert len(_DRIVER_PRIORITY) == 50
    assert list(CATALOG)[:50] == _DRIVER_PRIORITY
    out = set(CATALOG) - in_window
    assert out == _EXPECTED_OUT_OF_WINDOW
    # drop list and window must partition the catalog exactly
    assert in_window | out == set(CATALOG)
    assert not (in_window & _EXPECTED_OUT_OF_WINDOW)
