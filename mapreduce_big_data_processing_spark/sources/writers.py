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
    reference's custom-Partitioner co-location.

    Overwrite also clears a STALE warehouse location: a managed-table
    directory left by a previous session is unknown to a fresh in-memory
    catalog, and saveAsTable refuses to adopt it (LOCATION_ALREADY_EXISTS)
    — re-running the same pipeline in a new session must not require a
    manual rm."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil
        from urllib.parse import urlparse

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = urlparse(wh).path or wh
        shutil.rmtree(f"{loc.rstrip('/')}/{name.lower()}", ignore_errors=True)
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


def keyed_upsert(
    base: DataFrame,
    mutations: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
    broadcast_keys: bool = True,
    keep_tombstones: bool = False,
) -> DataFrame:
    """S10 write half — HBase put/delete as a join-based MERGE
    (`ppt/Ch6-HBase与Hive程序设计.pdf p.23-38`: Put/Delete mutations against
    a row-keyed table, latest version wins, a delete masks older cells).

    ``base`` is the current table state (key cols + ``version_col`` +
    value cols). ``mutations`` carries the same columns plus ``op_col``
    in {'put', 'delete'} (value cols NULL for deletes). Returns the new
    state with ``base``'s exact schema.

    Version semantics per key: the surviving row is the
    maximum-``version_col`` entry among the base row and the batch's
    mutations; at equal version a delete masks a put (HBase: deletes
    shadow puts at the same timestamp) and a mutation beats the stored
    row (HBase: higher seqid wins). A delete older than the stored row
    therefore does NOT remove it, and re-applying the same batch is a
    no-op — MERGE retries are idempotent.

    Scale shape: the mutation batch reduces to one winner per key (a
    batch-sized window), its KEY SET broadcasts, and the 100 TB base
    splits with broadcast anti/semi joins — untouched rows (the vast
    majority) pass through with NO exchange and no window; only rows
    whose key is mutated enter the batch-sized merge window. Pair with
    ``overwrite_partitions`` so re-writing the merged state touches only
    the partitions holding mutated keys. Set ``broadcast_keys=False``
    for a mutation batch too large to broadcast (falls back to shuffle
    joins on the key).

    ``keep_tombstones=True`` switches to the CONTINUOUS-ingest contract:
    ``base`` then carries ``op_col`` itself and delete winners are KEPT
    as tombstone rows instead of dropped. This is what makes a SEQUENCE
    of merges commute: without a stored tombstone, a reordered or
    retried batch holding an OLDER put for a deleted key would
    resurrect it (the HBase/Cassandra delete-marker rationale; the
    streaming upsert sink found this the hard way — a multi-file replay
    is not order-deterministic). Live rows are ``op = 'put'``; readers
    filter. Production compacts tombstones older than the replay
    horizon, exactly like Cassandra's gc_grace.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if keep_tombstones and op_col not in base.columns:
        raise ValueError(
            f"keyed_upsert(keep_tombstones=True): base must carry {op_col!r}"
        )
    missing = [
        c for c in (*base.columns, op_col) if c not in mutations.columns
    ]
    if missing:
        raise ValueError(
            f"keyed_upsert: mutations missing columns {missing} "
            "(deletes carry NULL value columns)"
        )

    # one winner per key inside the batch (delete masks put at equal version)
    wb = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.asc(op_col)
    )
    m = (
        mutations.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    keys = m.select(*key_cols).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    untouched = base.join(keys, list(key_cols), "left_anti")

    touched_base = base.join(keys, list(key_cols), "left_semi")
    if not keep_tombstones:
        touched_base = touched_base.withColumn(op_col, F.lit("put"))
    touched_base = touched_base.withColumn("__src", F.lit(0))
    contenders = touched_base.unionByName(
        m.select(*touched_base.columns[:-1], F.lit(1).alias("__src"))
    )
    wm = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.asc(op_col), F.desc("__src")
    )
    winners = contenders.withColumn("__rn", F.row_number().over(wm)).filter(
        F.col("__rn") == 1
    )
    if not keep_tombstones:
        winners = winners.filter(F.col(op_col) == "put")
    merged = winners.select(*base.columns)
    return untouched.unionByName(merged)
