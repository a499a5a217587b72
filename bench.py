"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": <scale factor>}.

Each query is executed to completion (collect) after a warm-up of the
session; time covers plan + execution, not JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

#: headline set: one per operator family, heaviest shapes first
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "brand_volume",
    "top_customers",
    "order_count_histogram",
    "nation_market_share",
    "supplier_rank_in_nation",
    "hourly_event_counts",
    "hourly_avg_value",
    "forecast_rmse",
    "user_session_counts",
    "word_count",
    "cooccurrence_pairs",
    "tfidf",
    "inverted_index",
    "exact_dedup",
    "token_stats",
    "quality_scores",
    "knn_predictions",
    "embedding_near_dup",
    "minhash_lsh_pairs",
    "chunk_dedup_docs",
    "benchmark_contamination",
    "bm25_ranked_docs",
    "doc_cross_entropy",
    "corpus_split_counts",
    "curated_training_set",
    "pagerank_top20",
]


def main() -> None:
    from mapreduce_big_data_processing_spark.session import get_session
    from mapreduce_big_data_processing_spark import queries as Q

    # adaptive=False: at sf≤0.1 every shuffle is a few MB — AQE's per-stage
    # re-optimization latency (~0.1 s/query) buys nothing here; it goes back
    # on for real scale (see session.get_session docstring)
    spark = get_session("bench", cpus=CPUS, adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in Q.QUERIES]

    # JVM JIT + whole-stage-codegen warm-up: run the same plans untimed at
    # the smallest scale factor (query *time* is the metric, not JVM
    # cold-start; DuckDB has no JIT ramp to amortize)
    # Warm-up at the MEASURED scale factor: whole-stage-codegen compiles
    # per physical plan, and AQE picks different physical plans at
    # different scales, so a small-sf warm-up leaves the real plans cold
    # (~0.3-0.5 s first-run compile per query). The DuckDB comparison is
    # timed on its second run too — steady-state latency on both sides.
    for name in names:
        Q.QUERIES[name](spark, SF_DIR).toPandas()
    # drop materialized .cache()s so timed runs re-execute full pipelines
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    for name in names:
        # median of 3: single-shot timings on a shared box swing ±0.5 s
        samples = []
        for _ in range(3):
            # each sample re-executes the FULL pipeline — drop .cache()s a
            # previous sample materialized (DuckDB re-runs its CTEs too)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, SF_DIR)
            # Arrow collect: materialize every result value on the driver —
            # the same contract the DuckDB comparison pays with fetchall().
            # (A noop-format write was ~0.37 s/query slower: the InsertInto
            # command path re-plans and runs a write-commit protocol per
            # call.)
            df.toPandas()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sorted(samples)[1], 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
