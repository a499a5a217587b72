"""Time-window log analytics (SURVEY.md §2.4 A15-A17, §2.9 M7).

Covers the reference's log-analysis project
(`final project/MapReduce课程设计1-日志分析.pdf p.2-3`): per-hour and
per-second grouped counts (tasks 1-3), windowed averages (task 4), and the
RMSE-scored next-day traffic forecast (task 5). The reference buckets
timestamps by string manipulation in mappers; here `F.window`/`date_trunc`
keeps it in codegen, and the same queries run under Structured Streaming
(see streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_count(
    df: DataFrame,
    ts: str,
    duration: str,
    *keys: str,
    out: str = "cnt",
) -> DataFrame:
    """A15 — tumbling-window grouped count (task 1-3 shape). Returns
    window_start/window_end columns instead of the struct so results are
    flat-comparable."""
    w = F.window(ts, duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            out,
        )
    )


def windowed_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """A16 — tumbling-window grouped aggregation (avg response time shape)."""
    w = F.window(ts, duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_count(
    df: DataFrame, ts: str, duration: str, slide: str, *keys: str, out: str = "cnt"
) -> DataFrame:
    """A15 sliding variant — overlapping windows; each row lands in
    duration/slide buckets."""
    w = F.window(ts, duration, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            out,
        )
    )


def rmse(joined: DataFrame, pred: str, actual: str, out: str = "rmse") -> DataFrame:
    """A17 — sqrt(mean((pred-actual)^2)); the spec says "implement RMSE
    yourself" (`…课程设计1….pdf p.3`)."""
    d = F.col(pred) - F.col(actual)
    return joined.agg(F.sqrt(F.avg(d * d)).alias(out))


def forecast_hourly_mean(
    df: DataFrame,
    ts: str,
    keys: list[str],
    holdout_day: str,
    out: str = "pred",
) -> DataFrame:
    """M7 — traffic forecasting (task 5): predict per-(key, hour-of-day)
    counts for ``holdout_day`` as the mean of the same hour over all prior
    days. One shuffle on (keys, hour); the 14-day history aggregate is tiny
    relative to the scan.
    """
    hist = (
        df.filter(F.col(ts) < F.lit(holdout_day).cast("timestamp"))
        .groupBy(
            *keys,
            F.to_date(ts).alias("day"),
            F.hour(ts).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        hist.groupBy(*keys, "hour")
        .agg(F.avg("cnt").alias(out))
    )


def forecast_vs_actual_rmse(
    df: DataFrame, ts: str, keys: list[str], holdout_day: str
) -> DataFrame:
    """M7+A17 — end-to-end: forecast the holdout day from prior history and
    score by RMSE against the held-out actuals (missing (key,hour) cells on
    either side count as 0, matching the spec's per-hour grid)."""
    pred = forecast_hourly_mean(df, ts, keys, holdout_day, out="pred")
    day_end = F.date_add(F.lit(holdout_day).cast("date"), 1).cast("timestamp")
    actual = (
        df.filter(
            (F.col(ts) >= F.lit(holdout_day).cast("timestamp"))
            & (F.col(ts) < day_end)
        )
        .groupBy(*keys, F.hour(ts).alias("hour"))
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    joined = pred.join(actual, [*keys, "hour"], "full_outer").select(
        F.coalesce("pred", F.lit(0.0)).alias("pred"),
        F.coalesce("actual", F.lit(0)).cast("double").alias("actual"),
    )
    return rmse(joined, "pred", "actual")


def sessionize(
    df: DataFrame, ts: str, user: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same user exceeds the threshold. (Extension —
    the streaming twin is `F.session_window`.)"""
    from pyspark.sql import Window

    w = Window.partitionBy(user).orderBy(ts)
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(new_sess).over(w))


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached stage k, where
    reaching stage k means an event of ``stages[k]`` occurred strictly
    AFTER the user's stage-(k-1) time (first-touch semantics: each stage
    time is the EARLIEST qualifying event).

    One shuffle total: every per-stage time is a window aggregate over the
    same ``user_col`` partitioning, so Catalyst chains all k Window nodes
    behind a single Exchange (pinned in the plan tests); the final tiny
    per-stage rollup aggregates k booleans per user.

    Output: (stage int 1-based, stage_name, n_users).
    """
    from pyspark.sql import Window

    if not stages:
        raise ValueError("funnel_stages: empty stage list")
    w = Window.partitionBy(user_col)
    df = events
    prev: Column | None = None
    flags = []
    for k, stage in enumerate(stages, start=1):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        df = df.withColumn(f"__t{k}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(f"__t{k}")
        flags.append(f"__t{k}")
    per_user = df.groupBy(user_col).agg(
        *[F.max(F.col(f).isNotNull().cast("int")).alias(f"r{k}")
          for k, f in enumerate(flags, start=1)]
    )
    rows = [
        F.struct(
            F.lit(k).alias("stage"),
            F.lit(stage).alias("stage_name"),
            F.sum(F.col(f"r{k}")).cast("bigint").alias("n_users"),
        )
        for k, stage in enumerate(stages, start=1)
    ]
    return per_user.agg(F.array(*rows).alias("a")).select(
        F.explode("a").alias("s")
    ).select("s.*")


def cohort_retention(
    events: DataFrame,
    signup_type: str = "signup",
    type_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    FIRST ``signup_type`` event; for each (cohort_week, week_offset ≥ 0)
    count the distinct cohort users with ANY event that week.

    Shuffle inventory: the per-user first-signup aggregate, its join back
    onto the event stream (user-cardinality side — NOT hinted broadcast:
    at 100 TB the cohort table is user-sized and may exceed broadcast
    range, so the planner/AQE picks broadcast when it fits and a shuffle
    join on ``user_col`` otherwise), and the final (cohort, offset)
    distinct-count. Week = `date_trunc('week')` (ISO Monday in both
    engines); offset in whole weeks via epoch arithmetic.

    Output: (cohort_week timestamp, week_offset int, n_active bigint).
    """
    first = (
        events.filter(F.col(type_col) == signup_type)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week"))
    )
    joined = events.join(first, user_col)
    offset = (
        (
            F.date_trunc("week", F.col(ts_col)).cast("long")
            - F.col("cohort_week").cast("long")
        )
        / 604800
    ).cast("int")
    return (
        joined.withColumn("week_offset", offset)
        .filter(F.col("week_offset") >= 0)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_active"))
    )


def gap_fill_resample(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: int = 86400,
) -> DataFrame:
    """Regularize an event stream into a per-key time series on a fixed
    ``step``-second grid, materializing missing buckets and forward-filling
    the last observed value — the resample + ffill primitive every
    time-series feature pipeline needs before windowed models (the
    reference's forecast chapter assumes dense hourly series; real logs
    are not).

    Plan shape (the 100 TB path): ONE data-sized aggregation buckets the
    raw events to (key, bucket) — everything after operates on the
    bucket-count-sized table: the per-key span agg, the grid explode
    (`sequence(min,max,step)` — rows ∝ key-span, not events), the
    co-keyed left join, and the ffill window. Buckets are BIGINT epoch
    seconds (engine-neutral — no timestamp-zone semantics in the hashed
    output). The per-bucket total is rounded at 3 decimals BEFORE the
    ffill copies it (2-decimal source data sums onto the rounding grid —
    boundary-free; see hourly_avg_value for the quotient-hash trap this
    protocol avoids).

    Output: (key, bucket, n_events, total_value, filled_total, is_gap) —
    gap rows have n_events=0, total_value NULL, filled_total carried
    forward from the last observed bucket.
    """
    from pyspark.sql import Window

    bucket = (F.unix_timestamp(F.col(ts_col)) / step).cast("bigint") * step
    per_bucket = (
        df.select(F.col(key_col), bucket.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 3).alias("total_value"),
        )
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence("__mn", "__mx", F.lit(step).cast("bigint"))
        ).alias("bucket"),
    )
    joined = grid.join(per_bucket, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "total_value",
        F.last("total_value", ignorenulls=True).over(w).alias("filled_total"),
        F.col("total_value").isNull().cast("int").alias("is_gap"),
    )


def rolling_count_anomalies(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    step: int = 3600,
    lookback: int = 24,
    z: int = 3,
    min_baseline: int = 12,
) -> DataFrame:
    """Rolling z-score anomaly detection over per-key bucket COUNTS —
    spike/drop flagging on event-rate series (ops dashboards, data-quality
    monitors), kept ENTIRELY in integer arithmetic so the flag is exact in
    any engine: with S=Σc, Q=Σc², n over the trailing ``lookback`` buckets
    (current excluded), |x−S/n| ≥ z·σ  ⇔  (n·x−S)² ≥ z²·(n·Q−S²)
    (population σ; both sides BIGINT — no float, no rounding boundary, no
    cross-engine summation order; Spark runs ANSI so a would-be overflow
    is loud, and at bucket counts ≤ ~10⁶ with lookback ≤ 10³ the terms sit
    ~10⁴ below the int64 ceiling).

    One data-sized aggregation buckets the stream; the rolling window runs
    on the bucket-count-sized series. Buckets with fewer than
    ``min_baseline`` prior observations report is_anomaly=0 (cold start).
    Missing buckets are NOT materialized here — compose with
    ``gap_fill_resample`` first when absence itself should alarm.

    Output: (key, bucket, cnt, n_prior, sum_prior, sumsq_prior,
    is_anomaly) — all integers.
    """
    from pyspark.sql import Window

    bucket = (F.unix_timestamp(F.col(ts_col)) / step).cast("bigint") * step
    series = (
        df.select(F.col(key_col), bucket.alias("bucket"))
        .groupBy(key_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(-lookback, -1)
    )
    n = F.count("cnt").over(w)
    s = F.sum("cnt").over(w)
    q = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    lhs = (n * F.col("cnt") - s)
    flag = (
        (n >= min_baseline)
        & (lhs * lhs >= F.lit(int(z * z)) * (n * q - s * s))
    ).cast("int")
    return series.select(
        key_col,
        "bucket",
        "cnt",
        F.coalesce(n, F.lit(0)).alias("n_prior"),
        F.coalesce(s, F.lit(0)).alias("sum_prior"),
        F.coalesce(q, F.lit(0)).alias("sumsq_prior"),
        F.coalesce(flag, F.lit(0)).alias("is_anomaly"),
    )


def count_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    step: int = 86400,
) -> DataFrame:
    """Per-key activity trend: the OLS slope of bucket counts over time,
    reported as its EXACT INTEGER components — slope = (n·Σxy − Σx·Σy) /
    (n·Σxx − (Σx)²) with x the bucket index (bucket/step, small ints) and
    y the bucket count. Every hashed column is an integer sum (no float
    protocol); the slope and its sign are derivable, and trend_sign is
    emitted as sign(numerator) since the denominator is ≥ 0.

    Two aggregations, both reducing: events → (key, bucket) counts
    (data-sized, one shuffle), then (key) trend sums (bucket-sized).
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / step).cast("bigint") * step
    series = (
        df.select(F.col(key_col), bucket.alias("bucket"))
        .groupBy(key_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    x = (F.col("bucket") / step).cast("bigint")
    y = F.col("cnt")
    per_key = series.groupBy(key_col).agg(
        F.count("*").alias("n_buckets"),
        F.sum(x).alias("sum_x"),
        F.sum(y).alias("sum_y"),
        F.sum(x * y).alias("sum_xy"),
        F.sum(x * x).alias("sum_xx"),
    )
    num = F.col("n_buckets") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    return per_key.select(
        key_col,
        "n_buckets",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_xx",
        F.signum(num).cast("int").alias("trend_sign"),
    )
