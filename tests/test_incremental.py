"""Incremental batch runner + dynamic partition overwrite."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.plans.incremental import (
    incremental_run,
    read_watermark,
)
from mapreduce_big_data_processing_spark.sources.writers import (
    overwrite_partitions,
)


def test_overwrite_partitions_touches_only_written_days(spark, tmp_path):
    path = str(tmp_path / "t")
    d1 = spark.createDataFrame(
        [("2020-01-01", 1), ("2020-01-02", 2)], "day string, v int"
    )
    overwrite_partitions(d1, path, ["day"])
    # rewrite ONLY day 2 with different content
    d2 = spark.createDataFrame([("2020-01-02", 99)], "day string, v int")
    overwrite_partitions(d2, path, ["day"])
    # partition values are type-inferred on read → compare as strings
    got = {(str(r["day"]), r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("2020-01-01", 1), ("2020-01-02", 99)}
    # mode restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        != "dynamic"
    )


def test_incremental_run_watermark_cycle(spark, tmp_path):
    state = str(tmp_path / "wm.json")
    sink = str(tmp_path / "out")
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "ts long, v string"
    )

    def process(df):
        df.write.mode("append").parquet(sink)

    assert incremental_run(src, "ts", state, process) == 3
    assert read_watermark(state) == "3"
    # nothing new → no-op, no new files
    n_files = len(glob.glob(f"{sink}/*.parquet"))
    assert incremental_run(src, "ts", state, process) == 0
    assert len(glob.glob(f"{sink}/*.parquet")) == n_files
    # new rows beyond the watermark → only the delta processed
    src2 = src.unionByName(
        spark.createDataFrame([(4, "d"), (5, "e")], "ts long, v string")
    )
    assert incremental_run(src2, "ts", state, process) == 2
    assert read_watermark(state) == "5"
    got = sorted(r["ts"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 4, 5]  # each row delivered exactly once


def test_incremental_run_crash_keeps_watermark(spark, tmp_path):
    state = str(tmp_path / "wm.json")
    src = spark.createDataFrame([(1, "a")], "ts long, v string")

    def boom(df):
        raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        incremental_run(src, "ts", state, boom)
    # watermark NOT advanced → the slice replays next run
    assert read_watermark(state) is None
    assert incremental_run(src, "ts", state, lambda df: df.count()) == 1


def test_incremental_run_timestamp_column(spark, sf_dir):
    """Watermark round-trips through str() for TIMESTAMP columns too."""
    from mapreduce_big_data_processing_spark import catalog

    ev = catalog.load(spark, "events", sf_dir)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        state = os.path.join(d, "wm.json")
        seen = []
        n1 = incremental_run(ev, "ts", state, lambda df: seen.append(df.count()))
        assert n1 == ev.count() and seen[0] == n1
        assert incremental_run(ev, "ts", state, lambda df: None) == 0


def test_nightly_sketch_maintenance_loop(spark, sf_dir, tmp_path):
    """The operational loop a 100 TB reporting pipeline runs nightly:
    incremental_run delivers only new events -> HLL sketch per
    (event_type, day) -> overwrite_partitions rewrites only the affected
    day partitions. After two incremental runs, merging the STORED sketch
    table must equal sketching all raw data directly — sketch once,
    merge forever, never rescan history."""
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.operators import sketches as SK
    from mapreduce_big_data_processing_spark.plans.incremental import (
        incremental_run,
    )

    ev = catalog.load(spark, "events", sf_dir).withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cut = days[len(days) // 2]
    state = str(tmp_path / "wm.json")
    store = str(tmp_path / "sketches")

    def process(delta):
        daily = SK.sketch_distinct(delta, ["event_type", "day"], "user_id")
        from mapreduce_big_data_processing_spark.sources.writers import (
            overwrite_partitions,
        )

        overwrite_partitions(daily, store, ["day"])

    # night 1: history up to the cut; night 2: the rest
    n1 = incremental_run(ev.filter(F.col("day") <= F.lit(cut)), "ts", state, process)
    n2 = incremental_run(ev, "ts", state, process)
    assert n1 > 0 and n2 > 0 and n1 + n2 == ev.count()

    stored = spark.read.parquet(store)
    got = {
        r["event_type"]: r["distinct_est"]
        for r in SK.merge_rollup(stored, ["event_type"]).collect()
    }
    want = {
        r["event_type"]: r["distinct_est"]
        for r in SK.merge_rollup(
            SK.sketch_distinct(ev, ["event_type", "day"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert got == want and len(got) == 5
