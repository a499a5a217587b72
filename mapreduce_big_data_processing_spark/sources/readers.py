"""Input connectors (SURVEY.md §2.1 S1-S5, S10-S11).

The reference reads line-oriented HDFS text through InputFormat taxonomy
(`ppt/Ch7-高级MapReduce编程技术.pdf p.14-22`): TextInputFormat (S1),
KeyValueTextInputFormat (S2), per-class-folder corpus enumeration
(`…/TF_IDF_Compute.java:76-78`, `FilePath.java:12-16`) (S3), custom
filename#offset RecordReaders (S4), and DBInputFormat (S5). Every consumer
re-parses strings; here every reader lands a typed DataFrame and Catalyst
prunes/pushes down into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_text_lines(spark: SparkSession, path: str, with_file: bool = False) -> DataFrame:
    """S1 — text-line scan; record = line (the (offset, line) key of
    TextInputFormat carries no information Spark needs). ``with_file`` adds
    the S4 provenance column (filename; offsets are an HDFS-ism)."""
    df = spark.read.text(path)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t",
    key_name: str = "key", value_name: str = "value",
) -> DataFrame:
    """S2 — KeyValueTextInputFormat: split each line at the first separator."""
    lines = spark.read.text(path)
    idx = F.instr(F.col("value"), sep)
    return lines.select(
        F.when(idx > 0, F.expr(f"substring(value, 1, instr(value, '{sep}') - 1)"))
        .otherwise(F.col("value"))
        .alias(key_name),
        F.when(idx > 0, F.expr(f"substring(value, instr(value, '{sep}') + 1)"))
        .otherwise(F.lit(None).cast("string"))
        .alias(value_name),
    )


def read_labeled_corpus(
    spark: SparkSession, root: str,
    label_depth: int = -2,
) -> DataFrame:
    """S3 — whole-directory ingestion where the folder layout is data: each
    document's label is its parent-folder name and its id the file name
    (the 20-newsgroups layout, `…/TF_IDF_Compute.java:76-78`).

    One distributed text scan with recursive lookup — the reference runs
    one MapReduce job per class folder (`…/TF_IDF_Compute.java:464-485`);
    here the label is parsed from `input_file_name`, so all classes scan in
    a single stage. ``label_depth=-2`` takes the immediate parent folder.
    Output: (label, doc_id, line).
    """
    parts = F.split(F.input_file_name(), "/")
    return (
        spark.read.option("recursiveFileLookup", "true")
        .text(root)
        .select(
            F.element_at(parts, label_depth).alias("label"),
            F.element_at(parts, -1).alias("doc_id"),
            F.col("value").alias("line"),
        )
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None,
    sep: str = ",", header: bool = False,
) -> DataFrame:
    """S2/S11 — delimited text with declared schema (never inferSchema in
    production: schema inference is a full extra pass)."""
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """Semi-structured ingestion (extension surface; `events.props` shape)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_lenient(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Quarantine-style ingestion for dirty corpora: PERMISSIVE parse with
    a `_corrupt_record` column, split into (clean, quarantined) frames.

    At 100 TB a single malformed line must neither kill the job (the
    reference's parsers throw on bad splits — one bad record fails the
    task, 4 retries fail the job) nor silently vanish (FAILFAST/DROPMALFORMED
    hide data-quality regressions). The quarantine frame keeps the raw line
    for replay after a parser fix. Both frames come from ONE parse pass;
    Spark requires the corrupt column to be cache-materialized before
    filtering on it alone, so callers writing both sinks should persist."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    clean = parsed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantined = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, quarantined


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """The columnar default: predicate pushdown + column pruning + page
    skipping — the 100 TB substrate the reference's text files can't give."""
    return spark.read.parquet(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None, upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S5 — DBInputFormat (`ppt/Ch7….pdf p.77`). Parallel reads require the
    partition-column bounds — one JDBC cursor per partition, matching the
    reference's DBRecordReader split behavior."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def keyed_table_scan(
    df: DataFrame, key_col: str,
    point: object | None = None,
    lower: object | None = None, upper: object | None = None,
) -> DataFrame:
    """S10 — the HBase access paths (`ppt/Ch6….pdf p.60`): point get, range
    scan, full scan — expressed as predicates so parquet/partition pruning
    does what the LSM row-key index did."""
    if point is not None:
        return df.filter(F.col(key_col) == point)
    if lower is not None or upper is not None:
        cond = F.lit(True)
        if lower is not None:
            cond = cond & (F.col(key_col) >= lower)
        if upper is not None:
            cond = cond & (F.col(key_col) <= upper)
        return df.filter(cond)
    return df


def latest_k_versions(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    k: int = 1,
    tiebreak_cols: list[str] | None = None,
    rank_name: str = "version_rank",
) -> DataFrame:
    """S10 — HBase cell-version semantics (`ppt/Ch6….pdf p.60-62`): a cell
    is (rowkey, qualifier, timestamp) and a read returns the newest k
    versions per cell, ordered newest-first. One window over the cell key —
    the partition key is exactly the HBase row key, so at scale this is a
    single shuffle (or none, if the table is already bucketed on it).
    ``tiebreak_cols`` break equal-timestamp ties deterministically (HBase
    resolves those by seqid; parquet rows need an explicit column)."""
    order = [F.desc(version_col)] + [F.desc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )
