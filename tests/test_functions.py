"""Tests for the shared column helpers (sparse codec round-trip, hashing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.functions import (
    decode_sparse_vector,
    encode_sparse_vector,
    hash60,
    sparse_dot,
)


def test_sparse_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [("3620:0.06716758797546718 4000:1.5",)], "s string"
    )
    vec = df.select(decode_sparse_vector(F.col("s")).alias("v"))
    rows = vec.collect()[0].v
    assert [(r.idx, r.val) for r in rows] == [
        (3620, pytest.approx(0.06716758797546718)),
        (4000, 1.5),
    ]
    back = vec.select(encode_sparse_vector(F.col("v")).alias("s")).collect()[0].s
    assert back == "3620:0.06716758797546718 4000:1.5"


def test_sparse_dot(spark):
    df = spark.createDataFrame([(1,)], "x int").select(
        sparse_dot(
            decode_sparse_vector(F.lit("1:2.0 3:1.0 5:4.0")),
            decode_sparse_vector(F.lit("1:3.0 5:0.5 7:9.0")),
        ).alias("d")
    )
    assert df.collect()[0].d == pytest.approx(2.0 * 3.0 + 4.0 * 0.5)


def test_hash60_flavors(spark):
    df = spark.createDataFrame([("abc",), ("abd",)], "s string")
    port = [r.h for r in df.select(hash60(F.col("s"), portable=True).alias("h")).collect()]
    fast = [r.h for r in df.select(hash60(F.col("s")).alias("h")).collect()]
    assert all(h >= 0 for h in port + fast)
    assert len(set(port)) == 2 and len(set(fast)) == 2
    # portable flavor matches DuckDB's md5-hex-prefix computation
    import duckdb

    d = duckdb.sql(
        "SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FROM (VALUES ('abc'), ('abd')) t(s)"
    ).fetchall()
    assert [r[0] for r in d] == port


def test_funnel_and_profile_reject_empty_inputs(spark):
    import pytest

    from mapreduce_big_data_processing_spark.operators import relational as R
    from mapreduce_big_data_processing_spark.operators import windows as W

    df = spark.range(3)
    with pytest.raises(ValueError, match="empty stage list"):
        W.funnel_stages(df, [])
    with pytest.raises(ValueError, match="no columns"):
        R.profile_table(df, columns=[])


def test_check_constraints_nulls_are_violations(spark):
    """Three-valued logic must not let NULLs slip through a CHECK: a NULL
    predicate result counts as a violation, and an all-pass rule reports
    passed=True."""
    from pyspark.sql import functions as F

    from mapreduce_big_data_processing_spark.operators import relational as R

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id long, v double"
    )
    got = {
        r.rule: (r.n_rows, r.violations, r.passed)
        for r in R.check_constraints(
            df,
            [("v_nonneg", F.col("v") >= 0), ("id_pos", F.col("id") > 0)],
        ).collect()
    }
    # v >= 0: row 2 is NULL (violation), row 3 is -1 (violation)
    assert got == {"v_nonneg": (3, 2, False), "id_pos": (3, 0, True)}
