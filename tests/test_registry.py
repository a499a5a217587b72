"""Pins the driver-facing registry contract.

The external driver's correctness gate checks the first ~50 entries of
``queries()`` in iteration order (round 1 stopped at exactly 50 of 120).
These tests pin the curated priority prefix so a refactor can't silently
push a SURVEY §2 component's primary query out of the checked window.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from mapreduce_big_data_processing_spark.queries import _PRIORITY, ORACLE, QUERIES

#: SURVEY §2 component / LLM capability -> queries acceptable as its
#: in-window representative. The window representative ROTATES across
#: rounds (r2 advice: everything should eventually be externally checked);
#: this map is what makes rotation safe — each component must keep AT
#: LEAST ONE member inside the 50-entry driver window, whichever one it is.
_COMPONENT_REPS = {
    "flagship": {"curated_training_set"},
    "P1/P2/A2": {"pricing_summary", "priority_line_mix",
                 "forecast_revenue_change",  # Q6: pure filter + partial agg
                 "clean_corpus"},  # fused projection/filter pipeline
    "J1/J4": {"revenue_by_nation", "nation_trade_flows",
               "volume_shipping", "shipping_priority",  # Q7 / Q3

               "local_supplier_volume",  # Q5 six-way chain
               "supplier_mkt_share_by_year",  # Q8 dual-role dim chain
               "part_profit_by_nation_year",  # Q9 LIKE-filtered star join
               "returned_revenue_top_customers"},  # Q10 returns top-k
    "J2": {"brand_volume", "disjunctive_part_revenue",
           "small_quantity_part_revenue"},
    "J3": {"customers_with_orders", "customers_without_orders",
           "excess_stock_parts",  # Q20: IN -> broadcast semi + correlated agg

           "bloom_filtered_orders",  # (bloom = pruned semi-join)
           "returned_orders_by_priority",  # (EXISTS -> left semi)
           "waiting_suppliers"},  # Q21 correlated EXISTS/NOT-EXISTS
    "O1/O4": {"top_customers", "top_words", "global_price_rank",
              "large_volume_customers", "top_revenue_supplier",  # Q15 view

              "customer_value_rank_profile"},  # global rank profile
    "A8": {"order_count_histogram", "customer_order_distribution",
           "customer_spend_quartiles", "value_percentiles",

           "exact_value_quartiles"},  # histogram pass + in-bin rank
    "A11": {"distinct_users_per_type", "approx_distinct_users",
            "part_supplier_variety"},  # Q16 count-distinct per group
    "A14": {"nation_market_share", "regional_market_share",
            "lang_mixture_weights"},  # per-group weight normalization
    "U3": {"segment_set_ops", "segment_except", "active_building_buyers",
           "idle_rich_customers"},  # Q22: key-set EXCEPT as anti join
    "scalar §2.7": {"status_rollup", "event_props_histogram",
                    "status_priority_cube", "grouping_sets_revenue"},
    "A4 ratio": {"finished_order_ratio", "nb_accuracy", "svm_accuracy",
                 "knn_accuracy", "promo_revenue_pct"},  # Q14 ratio of totals
    "A3": {"orders_per_year_priority",
           "status_priority_cube",  # cube's finest cell IS the composite-key agg
           "grouping_sets_revenue",  # finest grouping set, likewise
           "segment_pivot_revenue"},
    "O5": {"supplier_rank_in_nation", "top_parts_per_brand",
           "cheapest_parts_per_type",  # Q2 groupwise-min-with-ties

           "weighted_doc_sample",  # per-group top-w ticket window
           "hard_negative_pairs"},  # per-query top-k window
    "A15/A16": {"hourly_event_stats",  # the fused primary covers both
                "event_time_rollup",  # hour+day+total counts AND sums
                "sliding_window_counts",  # sliding-window count variant
                "daily_revenue_moving_avg",  # window-average variant
                "session_window_stats",  # native batch session_window
                "per_minute_error_counts", "trailing_hour_user_load"},
    "A17/M7": {"forecast_rmse", "forecast_peak_hour",
               "event_type_daily_trend",  # OLS trend — the forecasting step
               "brand_price_quantity_slope"},
    "A1/P3": {"word_count", "wordcount_sans_stopwords", "top_words",
              "cjk_word_count",  # the dictionary-segmentation half of P3
              "bpe_token_lengths"},  # learned-subword tokenizer apply
    "A5-A7": {"tfidf", "sparse_tfidf_vectors", "tfidf_reference_semantics",
              "source_distinctive_terms"},  # df-based term weighting (A6's
              # rare-term upweighting concept, cross-corpus keyness form)
    "A12": {"cooccurrence_pairs", "cooccurrence_window2",
            "pmi_collocations",
            "event_transition_counts"},  # adjacent-pair counting over
            # per-user event streams (the A12 pair rollup on a sequence)
    "A9/A10": {"inverted_index"},
    "P4/O2": {"user_event_timeline", "latest_event_per_user",
              "user_status_intervals"},  # secondary sort -> change runs
    "P5/U1": {"tagged_union_counts"},
    "J5/S11": {"hive_style_sql_join", "hive_compound_types"},
    "G1-G3/G5": {"pagerank_top20", "pagerank_converged"},
    "G4": {"label_propagation"},
    "M1/J6": {"knn_predictions", "knn_weighted_predictions",
               "knn_accuracy", "ivf_knn_recall",
               "knn_predictions_routed",  # the 100 TB LSH-bucketed route
               "hard_negative_pairs"},  # J6 similarity join, ANN-mined
    "M2/M3": {"nb_predictions", "nb_accuracy",
               "nb_predictions_reference_mode"},
    "M6": {"son_frequent_itemsets", "frequent_itemsets",
           "association_rules_conf"},  # the rule-generation step
    "M4": {"kmeans_clusters",
           "cluster_balanced_sample"},  # kmeans assignment end-to-end
    "M5": {"svm_predictions", "svm_accuracy",
           "class_centroids"},  # per-class grouped-map model fit
    "S1-S4/S6-S8": {"source_roundtrip", "parsed_access_log",
                    "csv_roundtrip", "orc_roundtrip", "jsonl_roundtrip"},
    "S5/S9": {"jdbc_roundtrip"},
    "S10": {"keyed_scan_latest", "keyed_table_upsert",
            "latest_event_per_user",
            "streaming_upsert_state"},  # the CDC write half, continuous
    "§2.10 streaming": {"streaming_hourly_counts", "streaming_session_counts",
                        "streaming_upsert_state", "streaming_dedup_counts",
                        "streaming_interval_join_counts",
                        "streaming_enriched_cohort_counts"},
    "§2.11 UDx": {"priority_geomean_price", "doc_token_chunks",
                  "embedding_gram_matrix",  # mapInPandas partition partials
                  "embedding_top_pc",  # power iteration ON the gram pass
                  "embedding_random_projection"},  # zero-shuffle Arrow matmul
    "exact dedup": {"exact_dedup", "dedup_survivors",
                    "incremental_ingest_dedup"},
    "incremental ingest": {"incremental_ingest_dedup",
                           "incremental_ingest_near_dup",
                           "multi_epoch_ingest_near_dup",
                           "streaming_near_dup_ingest",  # the SS fold twin
                           "streaming_embedding_ingest",  # the cosine twin
                           "streaming_compacted_ingest",  # + mid-stream compaction
                           "minhash_band_index"},  # the persisted-index family
    "minhash/shingle pairs": {"minhash_lsh_pairs", "minhash_band_index",
                              "minhash_estimate_error",  # sketch-accuracy eval

                              "prefix_jaccard_pairs"},  # the exact-threshold
                              # (PPJoin) sibling of the minhash path
    "dup clusters": {"near_dup_clusters", "embedding_dup_clusters",
                     "near_dup_clusters_star",  # diameter-independent CC
                     "leakage_free_split",  # CC-group split application
                     "quality_canonical_survivors"},
    "simhash": {"simhash_fingerprints", "simhash_near_dup_pairs"},
    "ann": {"similarity_topk", "lsh_similarity_topk", "multiprobe_lsh_topk",
            "ivf_similarity_topk", "pq_similarity_topk", "ivf_knn_recall",
            "quantized_similarity_topk", "ann_recall_eval",
            "hybrid_retrieval_rrf"},  # BM25+ANN reciprocal-rank fusion
    "quality": {"quality_scores", "doc_repetition_scores", "doc_ngram_repetition"},
    "textstats": {"language_id", "language_id_ngram", "token_stats",
                  "doc_fingerprints", "redacted_docs", "token_zipf_slope",
                  "source_token_entropy", "source_ngram_diversity",
                  "lang_label_agreement"},
    "embedding near-dup": {"embedding_near_dup", "embedding_near_dup_dense",
                           "banded_near_dup", "embedding_near_dup_probed",
                           "embedding_near_dup_sized"},
    "sketches": {"heavy_hitter_users", "monthly_user_reach_hll",
                 "event_type_user_overlap", "value_quantile_rollup",
                 "approx_value_percentiles", "user_freq_countmin"},
    "sampling": {"corpus_split_counts", "shuffled_shard_manifest",
                 "token_budget_sample", "cluster_balanced_sample",
                 "lang_quota_sample", "hash_sampled_docs",
                 "mixture_sampled_counts",
                 "weighted_doc_sample", "packed_sequences",
                 "kcenter_coreset"},
    "multimodal": {"multimodal_features"},
    "bm25/bpe lexical": {"bm25_ranked_docs",  # the text.py BPE+BM25 family
                         "bpe_vocab_merges", "bpe_token_lengths"},
    "chunk dedup": {"chunk_dedup_docs", "duplicate_text_spans",
                    "span_stripped_docs",  # sub-document dedup family
                    "doc_containment_pairs"},  # sub-document overlap stat
    "decontamination": {"benchmark_contamination", "semantic_contamination",
                        "semantic_contamination_sized",
                        "semantic_contamination_dense"},
    "boilerplate": {"boilerplate_stripped_docs"},
    "temporal joins": {"asof_click_before_purchase", "value_band_counts",
                       "asof_next_purchase_after_signup"},
}


def test_priority_names_all_registered():
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def _green_names_from_correctness_files() -> set[str]:
    """Names with at least one fully-green external CORRECTNESS row.

    Reads every CORRECTNESS_r*.json in the checkout, so the invariant is
    only checkout-independent if the newest round's file is COMMITTED
    before the window rotation that rests components on its rows (r6
    advice): a clean clone missing an untracked round would see fewer
    green names and could fail where the working tree passes."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    green: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def test_driver_window_covers_every_component():
    """Rotation policy (r6+): the window is fresh-first — every component
    must either have an in-window representative THIS round, or be
    resting on a prior-round green external CORRECTNESS row for at least
    one of its representatives. A component with neither is a coverage
    hole the driver can't see."""
    window = set(list(entrymod.queries())[:50])
    prior_green = _green_names_from_correctness_files()
    holes = {
        comp: sorted(reps)
        for comp, reps in _COMPONENT_REPS.items()
        if not (reps & window) and not (reps & prior_green)
    }
    assert not holes, f"components with no in-window rep AND no prior green row: {holes}"


def test_window_entries_all_have_oracles():
    """Every window slot must be a checkable row — a rotated-in query
    without an oracle would burn an external-verification slot on a
    rows-only check. (Since r3 even multimodal_features carries an oracle:
    DuckDB replays the deterministic generate→decode→feature arithmetic.)"""
    window = list(entrymod.queries())[:50]
    missing = [n for n in window if n not in ORACLE]
    assert not missing, f"window entries without oracles: {missing}"


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
