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


# Round-4 out-of-window set: every name here holds a green driver row
# from a PREVIOUS round (r3 unless noted) and was deliberately rotated
# out of the 50-entry window to make room for staler entries.  Pinning
# the set makes window reorders EXPLICIT: adding a catalog entry or
# reshuffling _DRIVER_PRIORITY must consciously update this list, so
# external driver coverage can never be dropped silently (ADVICE r3).
_EXPECTED_OUT_OF_WINDOW = {
    # r3-green, 1 round old
    "multimodal_features", "similarity_ivf_kmeans", "multimodal_resize",
    "multimodal_frames", "dedup_clusters", "gopher_quality", "pii_redact",
    "sample_stratified", "pack_sequences", "evm_join_enriched",
    "evm_transfer_volume", "evm_address_activity", "evm_block_activity",
    "decontaminate_ngram", "unigram_nll", "similarity_ivf_knn_join",
    "lang_id", "quality_score", "doc_fingerprint", "window_topk_per_group",
    "events_sessionize", "events_sliding_rollup", "rollup_orders",
    "cube_lineitem", "distinct_agg", "set_ops_customers",
    "semi_join_exists", "anti_join_not_exists", "asof_join_events",
    "range_join_events", "median_per_type", "orders_monthly",
    "dedup_survivors", "json_extract_props", "json_agg_by_key",
    # r2-green, lowest-churn deferrals — FIRST IN LINE for the r5 window
    "dedup_exact", "similarity_topk", "similarity_knn_join",
    "text_stats", "token_counts",
    # r2-green date-free TPC-H (no ts_micros exposure), deferred in r4
    # to make room for the new round-4 entries
    "q2_min_cost_supplier", "q11_important_parts", "q16_supplier_counts",
    # r2-green, displaced late in r4 by the never-checked store-index
    # entries (store_tx_bloom_lookup, store_projection_logs) — FIRST IN
    # LINE for the r5 window
    "q15_top_supplier", "q14_promo_revenue",
    # r2-green low-churn, displaced by the round-4 salted-top-k /
    # gapfill / triangle entries
    "q19_disjunctive", "q21_sole_supplier", "q22_idle_customers",
    # r2-green low-churn deferrals displaced by the second round-4 batch
    # (repetition_signals / substring_dup / source_mix_weights): q13 is
    # date-free, orders_having is a 3-line HAVING, and hourly_rollup's
    # epoch-window machinery is freshly covered by events_sliding_rollup
    # (r3-green) over the same code path
    "q13_order_distribution", "orders_having", "events_hourly_rollup",
    # never driver-checked yet (added late in r4, window already full of
    # staler rows) — FIRST IN LINE for the r5 window; until then covered
    # by the local oracle replay + the two-SF bound test in test_llm_ops
    "approx_quantile_p90", "cms_user_frequency", "unpivot_part_metrics",
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
