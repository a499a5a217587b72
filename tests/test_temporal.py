"""As-of join and range join behavior: golden semantics on hand-built
frames, tolerance, direction, and the scale property (no nested-loop join
in either plan)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark.operators import temporal as TP


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _tiny(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00")),
            (2, "a", _ts("2024-01-01T12:00:00")),
            (3, "b", _ts("2024-01-01T09:00:00")),
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30:00"), 10.0),
            ("a", _ts("2024-01-01T10:00:00"), 20.0),  # ties left id=1 exactly
            ("a", _ts("2024-01-01T11:00:00"), 30.0),
            ("b", _ts("2024-01-01T23:00:00"), 40.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_golden(spark):
    left, right = _tiny(spark)
    got = {
        r.id: (r.right_ts, r.right_v)
        for r in TP.asof_join(left, right, on="ts", by="k").collect()
    }
    # inclusive: id=1 matches the equal-ts 10:00 row, not 09:30
    assert got[1] == (_ts("2024-01-01T10:00:00"), 20.0)
    assert got[2] == (_ts("2024-01-01T11:00:00"), 30.0)
    assert got[3] == (None, None)  # no b-row at or before 09:00


def test_asof_forward_and_tolerance(spark):
    left, right = _tiny(spark)
    fwd = {
        r.id: r.right_v
        for r in TP.asof_join(
            left, right, on="ts", by="k", direction="forward"
        ).collect()
    }
    assert fwd == {1: 20.0, 2: None, 3: 40.0}
    # 30-minute tolerance drops b's 14-hour-away forward match
    tol = {
        r.id: r.right_v
        for r in TP.asof_join(
            left, right, on="ts", by="k", direction="forward", tolerance=1800
        ).collect()
    }
    assert tol == {1: 20.0, 2: None, 3: None}


def test_asof_plan_has_no_nested_loop(spark, sf_dir):
    ev = catalog.load(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    plan = (
        TP.asof_join(p, c, on="ts", by="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_naive_and_plans_equi(spark, sf_dir):
    ev = catalog.load(spark, "events", sf_dir).select("event_id", "value")
    bands = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1000.0)],
        "band string, lo double, hi double",
    )
    binned = TP.range_join(ev, bands, "value", "lo", "hi", bin_width=10.0)
    naive = ev.join(
        bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    assert sorted((r.event_id, r.band) for r in binned.collect()) == sorted(
        (r.event_id, r.band) for r in naive.collect()
    )
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan  # what the binning avoids


def test_range_join_closed_both(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 10.0)], "id long, v double")
    right = spark.createDataFrame([("x", 0.0, 10.0)], "band string, lo double, hi double")
    half = TP.range_join(left, right, "v", "lo", "hi", bin_width=4.0)
    assert [r.id for r in half.collect()] == [1]
    both = TP.range_join(left, right, "v", "lo", "hi", bin_width=4.0, closed="both")
    assert sorted(r.id for r in both.collect()) == [1, 2]


def test_gap_fill_resample_hand_worked(spark):
    """Hand-checkable grid + ffill: key A has a 2-bucket hole (both filled
    with A's last observed total), key B spans one bucket (no gap rows),
    grids never cross keys, and totals round at 3 decimals pre-fill."""
    from datetime import datetime

    from mapreduce_big_data_processing_spark.operators import windows as WIN

    rows = [
        # key A: buckets 0 and 3 observed (step=10s) -> gaps at 1, 2
        ("A", datetime(2024, 1, 1, 0, 0, 1), 1.111),
        ("A", datetime(2024, 1, 1, 0, 0, 9), 2.222),
        ("A", datetime(2024, 1, 1, 0, 0, 35), 7.0),
        # key B: single bucket
        ("B", datetime(2024, 1, 1, 0, 0, 59), 5.5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        (r.k, r.bucket): (r.n_events, r.total_value, r.filled_total, r.is_gap)
        for r in WIN.gap_fill_resample(df, "k", "ts", "value", step=10).collect()
    }
    base = 1704067200  # 2024-01-01T00:00:00Z epoch
    assert out == {
        ("A", base + 0): (2, 3.333, 3.333, 0),
        ("A", base + 10): (0, None, 3.333, 1),
        ("A", base + 20): (0, None, 3.333, 1),
        ("A", base + 30): (1, 7.0, 7.0, 0),
        ("B", base + 50): (1, 5.5, 5.5, 0),
    }


def test_rolling_count_anomalies_planted_spike(spark):
    """A flat count series with one planted spike: the spike bucket (and
    only it) flags once the baseline window is warm; cold-start buckets
    (n_prior < min_baseline) never flag; the integer sums are exact."""
    from datetime import datetime, timedelta

    from mapreduce_big_data_processing_spark.operators import windows as WIN

    rows = []
    t0 = datetime(2024, 1, 1)
    for h in range(12):           # 12 warm-up buckets, 2 events each
        for i in range(2):
            rows.append(("a", t0 + timedelta(hours=h, minutes=i)))
    for i in range(50):           # hour 12: spike of 50
        rows.append(("a", t0 + timedelta(hours=12, minutes=i)))
    for i in range(2):            # hour 13: back to normal
        rows.append(("a", t0 + timedelta(hours=13, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = sorted(
        WIN.rolling_count_anomalies(
            df, "event_type", "ts", step=3600, lookback=24, z=3, min_baseline=12
        ).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.cnt for r in out] == [2] * 12 + [50, 2]
    # buckets 0-11: cold start (n_prior < 12) -> never anomalous
    assert all(r.is_anomaly == 0 for r in out[:12])
    spike = out[12]
    assert (spike.n_prior, spike.sum_prior, spike.sumsq_prior) == (12, 24, 48)
    # flat baseline => sigma 0 => any deviation flags; the spike flags
    assert spike.is_anomaly == 1
    # hour 13: baseline now contains the spike; 2 is within 3 sigma
    post = out[13]
    assert post.n_prior == 13 and post.sum_prior == 74
    assert post.is_anomaly == 0


def test_count_trend_hand_worked(spark):
    """Rising vs falling synthetic series: exact regression sums and the
    numerator sign; a single-bucket key reports trend_sign 0 (numerator
    n*xy - x*y = 0 when n=1)."""
    from datetime import datetime, timedelta

    from mapreduce_big_data_processing_spark.operators import windows as WIN

    t0 = datetime(2024, 1, 1)
    rows = []
    for d, cnt in enumerate([1, 2, 3]):        # rising
        rows += [("up", t0 + timedelta(days=d, minutes=i)) for i in range(cnt)]
    for d, cnt in enumerate([3, 2, 1]):        # falling
        rows += [("down", t0 + timedelta(days=d, minutes=i)) for i in range(cnt)]
    rows += [("flat1", t0)]                    # one bucket
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in WIN.count_trend(df, "event_type", "ts").collect()}
    x0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    up = out["up"]
    assert (up.n_buckets, up.sum_y, up.trend_sign) == (3, 6, 1)
    assert up.sum_x == 3 * x0 + 3
    assert up.sum_xy == 1 * x0 + 2 * (x0 + 1) + 3 * (x0 + 2)
    assert out["down"].trend_sign == -1
    assert out["flat1"].trend_sign == 0
