"""HLL sketch rollup: accuracy and lossless-merge properties.

The whole point of the sketch cube is that merging daily sketch states
answers the monthly question without re-scanning raw data — these tests pin
(a) the estimate is close to exact, (b) merge-of-parts equals the
single-pass sketch (same lgConfigK → lossless union), so rollup depth
never degrades the answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark import queries as Q
from mapreduce_big_data_processing_spark.operators import sketches as SK


def test_hll_query_smoke(spark, sf_dir):
    """Registered rows-only query returns one estimate per event type."""
    rows = Q.QUERIES["monthly_user_reach_hll"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["distinct_est"] > 0 for r in rows)


def test_hll_rollup_accuracy_and_lossless_merge(spark, sf_dir):
    ev = catalog.load(spark, "events", sf_dir).withColumn(
        "day", F.date_trunc("day", "ts")
    )

    daily = SK.sketch_distinct(ev, ["event_type", "day"], "user_id")
    rolled = {
        r["event_type"]: r["distinct_est"]
        for r in SK.merge_rollup(daily, ["event_type"]).collect()
    }

    single_pass = {
        r["event_type"]: r["distinct_est"]
        for r in SK.merge_rollup(
            SK.sketch_distinct(ev, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }

    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }

    assert set(rolled) == set(exact)
    for et, n in exact.items():
        # lgConfigK=12 → ~1.6% relative standard error; allow 3 sigma
        assert abs(rolled[et] - n) <= max(3, 0.05 * n), (et, rolled[et], n)
        # merging the daily parts must equal sketching the whole directly
        assert rolled[et] == single_pass[et], (et, rolled[et], single_pass[et])
