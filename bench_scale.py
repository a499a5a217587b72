"""Scale-stress runner: the headline query set on generated >=10x fixtures.

``bench.py`` is the driver-facing harness pinned to the sf0.1 fixtures;
this tool measures the SAME headline set on ``tools_gen_scale.py`` output
(1x/10x/100x sf0.1) with the 100 TB session posture (AQE on), so the
scaling claims in SCALE.md are measured, not argued. Also runs the
skew-mitigation demo on the ``events_skew`` table (one user owns ~30% of
all rows): naive shuffle join vs AQE skew-split vs explicit salting
(`relational.skew_join`), plus evidence that two-stage hash aggregation
already neutralizes hot keys for decomposable aggregates (so
`salted_group_agg` is the fallback for when partial agg can't reduce, not
a default).

Usage:
    python bench_scale.py scale_data/sf0.1 scale_data/sf1 scale_data/sf10

Prints one JSON line per sf dir:
    {"sf_dir": ..., "total_sec": N, "queries": {...}, "skew": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SAMPLES = int(os.environ.get("SPARK_GRAFT_SCALE_SAMPLES", "2"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _time_query(spark, fn, sf_dir: str) -> float:
    # untimed warm-up: whole-stage-codegen compiles per physical plan and
    # parquet footers populate caches; without it the FIRST sf dir measured
    # carries ~0.3-0.5 s/query of one-time cost the later dirs don't
    spark.catalog.clearCache()
    fn(spark, sf_dir).toPandas()
    samples = []
    for _ in range(SAMPLES):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        samples.append(time.perf_counter() - t0)
    # min-of-N: on a shared box the floor is the signal; JIT warm-up and
    # GC pauses only ever add time
    return round(min(samples), 3)


def skew_demo(spark, sf_dir: str) -> dict:
    """Hot-key join three ways + hot-key aggregation two ways."""
    from pyspark.sql import functions as F

    from mapreduce_big_data_processing_spark.operators import relational as R

    ev = spark.read.parquet(os.path.join(sf_dir, "events_skew.parquet"))
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    users = spark.range(n_users).select(
        F.col("id").alias("user_id"),
        (F.pmod(F.xxhash64("id"), F.lit(10))).alias("cohort"),
    )

    def timed(tag, thunk, out):
        t0 = time.perf_counter()
        thunk()
        out[tag] = round(time.perf_counter() - t0, 3)

    res: dict = {"hot_key_share": 0.30, "n_users": n_users}

    # force a shuffle join: at demo scale the dim fits under the broadcast
    # threshold, which would hide the skew a 100 TB dim table exhibits
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # demo-scale skew detection: partitions here are tens of MB, not the
    # GBs where AQE's 256 MB default threshold starts firing
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        timed("join_naive_noaqe", lambda: ev.join(users, "user_id").count(), res)
        timed(
            "join_salted_noaqe",
            lambda: R.skew_join(ev, users, "user_id", salt_buckets=CPUS).count(),
            res,
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        timed("join_aqe_skewsplit", lambda: ev.join(users, "user_id").count(), res)

        # decomposable agg: two-stage HashAggregate already collapses the hot
        # key map-side; salting should NOT win here (that's the point)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        timed(
            "agg_naive",
            lambda: ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .toPandas(),
            res,
        )
        timed(
            "agg_salted",
            lambda: R.salted_group_agg(
                ev, ["user_id"], {"n": ("count", "value"), "v": ("sum", "value")}
            ).toPandas(),
            res,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    return res


def main() -> None:
    from bench import HEADLINE

    from mapreduce_big_data_processing_spark import queries as Q
    from mapreduce_big_data_processing_spark.session import get_session

    spark = get_session("bench-scale", cpus=CPUS, adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sys.argv[1:]:
        sf_dir = os.path.abspath(sf_dir)
        names = [n for n in HEADLINE if n in Q.QUERIES]
        skip = {
            s for s in os.environ.get("SPARK_GRAFT_SCALE_SKIP", "").split(",") if s
        }
        times: dict[str, float] = {}
        for name in names:
            if name in skip:
                continue
            times[name] = _time_query(spark, Q.QUERIES[name], sf_dir)
            # stream progress to stderr: a 100x run can take an hour, and a
            # killed run should still leave per-query evidence
            print(f"# {sf_dir} {name} {times[name]}", file=sys.stderr, flush=True)
        out = {
            "sf_dir": sf_dir,
            "total_sec": round(sum(times.values()), 3),
            "queries": times,
        }
        if os.path.exists(os.path.join(sf_dir, "events_skew.parquet")):
            out["skew"] = skew_demo(spark, sf_dir)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
