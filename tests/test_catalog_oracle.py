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


# Out-of-window set: every name here holds a green driver row from a
# PREVIOUS round and was deliberately rotated out of the 50-entry
# window to make room for staler / never-checked / code-dirtied
# entries.  Pinning the set makes window reorders EXPLICIT: adding a
# catalog entry or reshuffling _DRIVER_PRIORITY must consciously update
# this list, so external driver coverage can never be dropped silently
# (ADVICE r3).
#
# Since round 7 the ordering is GENERATED, not hand-written: both this
# set and catalog._DRIVER_PRIORITY come from `tools/rotation_plan.py
# --emit`, which derives per-entry freshness from the CORRECTNESS_r*.json
# history (flagship core pinned; never-checked + DIRTY first; then
# stalest-green first).  test_rotation_plan.py asserts the committed
# window matches the generated one, so the bookkeeping can't drift from
# the data (VERDICT r6 "what's wrong" #4).
_EXPECTED_OUT_OF_WINDOW = {
    "anti_join_not_exists",  # newest green r9
    "approx_distinct_users",  # newest green r10
    "approx_quantile_p90",  # newest green r9
    "asof_join_events",  # newest green r9
    "bm25_search",  # newest green r10
    "chunk_documents",  # newest green r9
    "cms_user_frequency",  # newest green r8
    "corpus_length_histogram",  # newest green r10
    "corpus_report",  # newest green r8
    "corpus_zipf_slope",  # newest green r10
    "cube_lineitem",  # newest green r9
    "decontaminate_ngram",  # newest green r9
    "dedup_clusters",  # newest green r9
    "dedup_embedding_cosine",  # newest green r10
    "dedup_embedding_lsh",  # newest green r10
    "dedup_minhash_lsh",  # newest green r10
    "dedup_ngram_jaccard",  # newest green r10
    "dedup_simhash",  # newest green r10
    "dedup_spans_global",  # newest green r9
    "dedup_survivors",  # newest green r9
    "dedup_winnowing",  # newest green r9
    "distinct_agg",  # newest green r9
    "doc_fingerprint",  # newest green r9
    "embedding_pca_whiten",  # newest green r9
    "events_gapfill_locf",  # newest green r10
    "events_sessionize",  # newest green r9
    "events_sliding_rollup",  # newest green r9
    "evm_address_activity",  # newest green r9
    "evm_block_activity",  # newest green r9
    "gopher_quality",  # newest green r9
    "graph_triangle_count",  # newest green r10
    "interval_join_events",  # newest green r8
    "json_agg_by_key",  # newest green r9
    "json_extract_props",  # newest green r9
    "lang_id",  # newest green r9
    "lm_stupid_backoff_quad",  # newest green r10
    "lm_stupid_backoff_tri",  # newest green r10
    "median_per_type",  # newest green r9
    "multimodal_frames",  # newest green r9
    "multimodal_meta",  # newest green r10
    "multimodal_resize",  # newest green r10
    "orders_monthly",  # newest green r9
    "pack_sequences",  # newest green r9
    "pii_redact",  # newest green r9
    "pivot_order_status",  # newest green r10
    "q10_returned_items",  # newest green r10
    "q12_late_shipments",  # newest green r10
    "q17_small_qty_avg",  # newest green r10
    "q18_large_orders",  # newest green r10
    "q1_pricing_summary",  # newest green r10
    "q20_excess_sellers",  # newest green r10
    "q3_shipping_priority",  # newest green r10
    "q4_priority_check",  # newest green r10
    "q5_local_supplier",  # newest green r10
    "q6_forecast_revenue",  # newest green r10
    "q7_nation_volume",  # newest green r10
    "q8_market_share",  # newest green r10
    "q9_product_profit",  # newest green r10
    "quality_classifier_scores",  # newest green r9
    "quality_score",  # newest green r9
    "range_join_events",  # newest green r9
    "repetition_signals",  # newest green r10
    "rollup_orders",  # newest green r9
    "sample_stratified",  # newest green r9
    "semantic_admit_delta",  # newest green r10
    "semantic_dedup",  # newest green r10
    "semi_join_exists",  # newest green r9
    "set_ops_customers",  # newest green r9
    "similarity_ivf_kmeans",  # newest green r9
    "similarity_ivf_knn_join",  # newest green r9
    "similarity_ivf_topk",  # newest green r10
    "similarity_ivfpq_knn_join",  # newest green r10
    "similarity_ivfpq_residual_knn_join",  # newest green r10
    "similarity_ivfpq_topk",  # newest green r10
    "skew_salted_topk",  # newest green r10
    "source_mix_weights",  # newest green r10
    "store_changefeed_deletes",  # newest green r9
    "store_compacted_logs",  # newest green r9
    "store_projection_logs",  # newest green r10
    "store_stats_manifest",  # newest green r10
    "store_time_travel",  # newest green r10
    "store_tx_bloom_lookup",  # newest green r9
    "store_zorder_logs",  # newest green r9
    "substring_dup",  # newest green r10
    "unigram_nll",  # newest green r9
    "window_lag_delta",  # newest green r10
    "window_running_sum",  # newest green r10
    "window_topk_per_group",  # newest green r9
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
