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
