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
        # If the catalog knows the table, resolve its REAL location before
        # dropping (qualified names live at <db>.db/<table>, not <table>);
        # the guessed-path fallback only covers the stale-dir case where a
        # previous session's directory is unknown to this catalog.
        loc = None
        managed = False
        try:
            # tableExists first: DESCRIBE on a missing table raises an
            # AnalysisException that Spark logs at ERROR level before we
            # could catch it — pure log spam on the common first-write path
            if spark.catalog.tableExists(name):
                tbl = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
                for r in tbl:
                    if r["col_name"] == "Location":
                        loc = r["data_type"]
                    if r["col_name"] == "Type":
                        managed = r["data_type"].upper() == "MANAGED"
        except Exception:
            pass
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil
        from urllib.parse import urlparse

        def _local_dir(uri: str) -> str | None:
            """file:-scheme (or schemeless) URIs only — a non-local
            warehouse (hdfs:/s3a:) can't be cleaned with shutil, and
            silently skipping it is correct: DROP TABLE already removed
            managed data there."""
            p = urlparse(uri)
            if p.scheme in ("", "file"):
                return p.path or uri
            return None

        if loc is not None:
            # Clean only MANAGED tables' directories: an EXTERNAL
            # location belongs to the user, and DROP TABLE deliberately
            # leaves its data in place.
            d = _local_dir(loc) if managed else None
            if d:
                shutil.rmtree(d, ignore_errors=True)
        else:
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            whd = _local_dir(wh)
            if whd:
                # Last two segments handle qualified names of any depth:
                # "tbl" -> tbl, "db.tbl" -> db.db/tbl, and
                # "spark_catalog.db.tbl" -> db.db/tbl (the catalog prefix
                # is never a warehouse directory).
                parts = name.lower().split(".")
                rel = (
                    f"{parts[-2]}.db/{parts[-1]}"
                    if len(parts) >= 2
                    else parts[0]
                )
                shutil.rmtree(
                    f"{whd.rstrip('/')}/{rel}", ignore_errors=True
                )
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucket_cols:
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.saveAsTable(name)


def drop_table(spark, name: str) -> None:
    """Table-lifecycle admin: DROP (`ppt/Ch6-HBase与Hive程序设计.pdf
    p.23-38` teaches disable+drop for HBase and DROP TABLE for Hive —
    Spark's catalog needs no disable step). Managed data is removed by
    the catalog; for a LOCAL file: warehouse, also clear any leftover
    directory so a later `save_as_table` in a fresh session cannot hit
    LOCATION_ALREADY_EXISTS (same stale-dir concern as overwrite)."""
    import shutil
    from urllib.parse import urlparse

    loc = None
    managed = False
    try:
        if spark.catalog.tableExists(name):
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
                if r["col_name"] == "Location":
                    loc = r["data_type"]
                if r["col_name"] == "Type":
                    managed = r["data_type"].upper() == "MANAGED"
    except Exception:
        pass
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if loc is not None and managed:
        p = urlparse(loc)
        if p.scheme in ("", "file"):
            shutil.rmtree(p.path or loc, ignore_errors=True)


def alter_table_add_columns(spark, name: str, columns: dict[str, str]) -> None:
    """Table-lifecycle admin: ALTER TABLE … ADD COLUMNS (the Hive-side
    alter of `ppt/Ch6….pdf p.23-38`). New columns read as NULL for
    existing files — schema evolution without a rewrite, which is the
    only alter that stays O(1) at 100 TB (a type change would rewrite
    every file; use a new table + backfill for that)."""
    cols = ", ".join(f"{c} {t}" for c, t in columns.items())
    spark.sql(f"ALTER TABLE {name} ADD COLUMNS ({cols})")


def rename_table(spark, old: str, new: str) -> None:
    """Table-lifecycle admin: ALTER TABLE … RENAME TO — a catalog-only
    metadata operation (no data movement) for managed tables."""
    spark.sql(f"ALTER TABLE {old} RENAME TO {new}")


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

    # one winner per key inside the batch (delete masks put at equal
    # version). Two puts for the same key at the same version have no
    # semantic order — break the tie on the VALUE columns so the winner
    # is at least deterministic across runs/replans instead of
    # task-scheduling luck.
    value_cols = [
        c
        for c in base.columns
        if c not in key_cols and c not in (version_col, op_col)
    ]
    tiebreak = [F.asc_nulls_first(c) for c in value_cols]
    wb = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.asc(op_col), *tiebreak
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
        F.desc(version_col), F.asc(op_col), F.desc("__src"), *tiebreak
    )
    winners = contenders.withColumn("__rn", F.row_number().over(wm)).filter(
        F.col("__rn") == 1
    )
    if not keep_tombstones:
        winners = winners.filter(F.col(op_col) == "put")
    merged = winners.select(*base.columns)
    return untouched.unionByName(merged)
