"""Pins the driver-facing registry contract.

The external driver's correctness gate checks the first ~50 entries of
``queries()`` in iteration order (round 1 stopped at exactly 50 of 120).
These tests pin the curated priority prefix so a refactor can't silently
push a SURVEY §2 component's primary query out of the checked window.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from mapreduce_big_data_processing_spark.queries import _PRIORITY, ORACLE, QUERIES

#: one primary query per SURVEY §2 component / LLM capability that MUST
#: have a driver-gate row (VERDICT r1 "Next round" item 1)
_REQUIRED_IN_WINDOW = {
    "curated_training_set",  # flagship
    # relational & aggregation core
    "pricing_summary", "revenue_by_nation", "brand_volume",
    "customers_with_orders", "top_customers", "order_count_histogram",
    "distinct_users_per_type", "nation_market_share", "segment_set_ops",
    "status_rollup", "finished_order_ratio", "orders_per_year_priority",
    "supplier_rank_in_nation", "hourly_event_stats", "forecast_rmse",
    "word_count", "tfidf", "cooccurrence_pairs", "inverted_index",
    "user_event_timeline", "tagged_union_counts", "hive_style_sql_join",
    # graph / ML
    "pagerank_top20", "label_propagation", "knn_predictions",
    "nb_predictions", "son_frequent_itemsets", "kmeans_clusters",
    "svm_predictions",
    # sources / streaming / UDx
    "source_roundtrip", "jdbc_roundtrip", "keyed_scan_latest",
    "streaming_hourly_counts", "priority_geomean_price",
    # LLM pipeline
    "exact_dedup", "minhash_lsh_pairs", "near_dup_clusters",
    "simhash_fingerprints", "similarity_topk", "quality_scores",
    "language_id", "embedding_near_dup", "heavy_hitter_users",
    "corpus_split_counts", "multimodal_features", "bm25_ranked_docs",
    "chunk_dedup_docs", "benchmark_contamination",
    "boilerplate_stripped_docs",
}


def test_priority_names_all_registered():
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_driver_window_covers_all_primary_queries():
    window = list(entrymod.queries())[:50]
    assert len(_REQUIRED_IN_WINDOW) == 50
    missing = _REQUIRED_IN_WINDOW - set(window)
    assert not missing, f"primary queries outside the 50-entry window: {missing}"


def test_ordered_registry_is_complete():
    qs = entrymod.queries()
    assert set(qs) == set(QUERIES)
    osql = entrymod.oracle_sql()
    assert set(osql) == set(ORACLE)
    assert set(osql) <= set(qs)


def test_window_prefix_matches_priority_list():
    assert list(entrymod.queries())[: len(_PRIORITY)] == [
        n for n in _PRIORITY if n in QUERIES
    ]
