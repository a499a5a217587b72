"""Streaming mode for the windowed log-analytics operators (SURVEY.md §2.10).

The reference is batch-only — its "windows" are group-bys over a timestamp
column of static logs (`…课程设计1-日志分析.pdf p.2-3`). This module runs
the *same* aggregations under Structured Streaming: identical F.window
expressions, plus what batch can't express — watermarks for late data,
session windows, and incremental state. The batch/streaming pair shares
semantics by construction (one definition of the aggregation, two modes).

Local testing drives a parquet-directory stream to completion with
`processAllAvailable()` (no Kafka in this environment; swap `readStream`
format for kafka in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of event files."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_count_stream(
    events: DataFrame, duration: str = "1 hour", watermark: str = "2 hours",
    *keys: str,
) -> DataFrame:
    """A15 streaming twin — tumbling-window counts with a watermark bounding
    state for late data (semantics batch mode cannot express)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "cnt",
        )
    )


def windowed_avg_stream(
    events: DataFrame, value_col: str = "value",
    duration: str = "1 hour", watermark: str = "2 hours", *keys: str,
) -> DataFrame:
    """A16 streaming twin — windowed average."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(F.avg(value_col).alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "avg_value",
        )
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via `session_window` — the stateful twin of
    operators.windows.sessionize.

    ``watermark=None`` skips the watermark: session state then never
    expires AND no row is ever dropped as late — required for exact
    batch-equivalence on bounded replays in `complete` mode, because
    session-window state drops watermark-late rows in EVERY output mode
    (unlike tumbling windows under `complete`; measured: an unordered
    4-file replay lost 227 of 946 sessions). Production streams keep the
    watermark (bounded state) and accept the documented late-data drop."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events
        .groupBy(F.session_window("ts", gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts", watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the streaming twin of
    operators.dedup.exact_dedup. `dropDuplicatesWithinWatermark` keeps a
    key only until the watermark passes its event time, so state is
    O(keys-per-watermark-window), not O(all keys ever seen): the property
    that makes continuous ingest dedup viable at 100 TB/day (a plain
    `dropDuplicates` on a stream never frees state). Duplicates arriving
    within the watermark horizon are suppressed; exact-once beyond it is
    the upstream log's job (e.g. Kafka keys)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_join_stream(
    left: DataFrame, right: DataFrame, key: str = "user_id",
    left_ts: str = "ts", right_ts: str = "ts",
    upper: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream equi-join with a time-bound — each left row matches
    right rows with the same key whose timestamp lands in
    [left_ts, left_ts + upper]. The time bound + watermarks are what let
    both sides' join state expire (an unbounded stream-stream join never
    frees anything); the batch analogue is operators.temporal.range_join.
    Column names are prefixed l_/r_ to keep the output schema stable."""
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    return l.join(
        r,
        F.expr(f"l_key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + interval {upper}"),
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, key: str = "user_id", how: str = "left",
) -> DataFrame:
    """Stream-static broadcast enrichment — the streaming twin of the
    replicated join (SURVEY §2.3 J2, the reference's distributed-cache
    pattern). The static side is broadcast once per micro-batch and holds
    NO streaming state: at 100 TB/day this is the only join shape that
    adds zero state to the stream (dimension updates are picked up on the
    next batch since the static plan re-resolves per trigger)."""
    return events.join(F.broadcast(dim), key, how)


def write_foreach_batch_parquet(
    stream_df: DataFrame, path: str, checkpoint: str,
) -> None:
    """Exactly-once parquet sink via foreachBatch: each micro-batch
    OVERWRITES its own `epoch=<batchId>` partition, so a retried batch
    (same batchId after failure) replaces rather than duplicates — the
    idempotent-sink half of Structured Streaming's exactly-once contract
    (the checkpoint's WAL is the other half). Drives the bounded local
    stream to completion; production keeps the query running."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a bounded file-source stream to completion into an in-memory
    table (local test harness; production sinks are kafka/parquet/foreachBatch)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def approx_reach_stream(
    events: DataFrame, duration: str = "1 day", watermark: str = "2 hours",
    *keys: str, lg_k: int = 12,
) -> DataFrame:
    """Windowed approximate distinct users (reach) over a stream: an HLL
    sketch per (window, keys) cell as the aggregation state. Exact
    streaming count-distinct needs per-key set state that grows without
    bound; the sketch is constant-size (2^lg_k registers), mergeable
    across triggers, and the watermark evicts closed windows — bounded
    state at any stream rate. DataSketches HLL is deterministic for a
    given input set, so the streamed estimate equals the batch estimate
    over the same data (asserted in tests)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("hll"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            F.hll_sketch_estimate("hll").alias("reach_est"),
        )
    )
