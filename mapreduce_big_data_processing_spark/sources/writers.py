"""Output connectors (SURVEY.md §2.1 S6-S9, S11).

The reference's sinks: tab-separated text (S6, TextOutputFormat,
`ppt/Ch7….pdf p.23`), key-routed multi-file output (S7, MultipleOutputs in
`…/TF_IDF_Compute.java:183` and MultipleTextOutputFormat per-country files
`ppt/Ch7….pdf p.69-71`), overwrite-tolerant jobs that no-op the
output-exists check (S8, `…/TF_IDF_Compute.java:30-36`), DBOutputFormat
(S9, `ppt/Ch7….pdf p.78-80`) and Hive DDL/load (S11, `ppt/Ch6….pdf p.52-53`).

Spark-side: dynamic partition writes replace MultipleOutputs; save modes
replace the checkOutputSpecs hack; parquet is the durable default (text
kept for format parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite", sep: str = "\t") -> None:
    """S6 — `key\\tvalue` text sink (TextOutputFormat parity)."""
    df.write.mode(mode).option("sep", sep).csv(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str],
    fmt: str = "parquet", mode: str = "overwrite",
) -> None:
    """S7 — key-routed output: one directory per key value via dynamic
    partition writes. The reference hand-routes records to files named from
    keys (per-document TF files, per-country patents, per-IP logs
    `…课程设计1….pdf p.2`); `partitionBy` is the same routing done by the
    committer, and downstream scans get partition pruning for free."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8 — mode='overwrite'/'append' replaces the reference's overridden
    checkOutputSpecs no-op (it appended multiple jobs into one tree)."""
    df.write.mode(mode).parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """S9 — DBOutputFormat (`ppt/Ch7….pdf p.78-80`). One connection per
    partition; batch inserts handled by the JDBC datasource."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def save_as_table(
    df: DataFrame, name: str,
    partition_cols: list[str] | None = None,
    bucket_cols: list[str] | None = None, n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """S11 — Hive-style managed table (`CREATE TABLE` + `LOAD DATA`,
    `ppt/Ch6….pdf p.52-53`). Bucketing pre-shuffles on the join key so
    later joins/aggs on it skip the exchange — the declarative form of the
    reference's custom-Partitioner co-location."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucket_cols:
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.saveAsTable(name)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Idempotent backfill: replace ONLY the partitions present in ``df``,
    leaving sibling partitions untouched (dynamic partitionOverwriteMode).

    This is the batch twin of the streaming foreachBatch epoch-overwrite
    sink: re-running a day's job rewrites that day's directory and nothing
    else, so retries and backfills are exactly-once at the partition
    level. STATIC mode (the default) would truncate the whole table — the
    classic footgun this wrapper exists to avoid.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
