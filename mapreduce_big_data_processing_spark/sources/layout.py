"""Physical data layout for scan pruning (the 100 TB write path).

The reference treats files as opaque line bags — every query re-reads
everything. At scale the dominant cost lever is writing data so later
scans can SKIP most of it: parquet keeps min/max statistics per row group
and per file, and Spark's pushed-down predicates prune any unit whose
stats range misses the filter. That only works if the writer CLUSTERS
values, so ranges are narrow:

- ``write_range_clustered``: global range-partition + in-partition sort on
  the hot filter column (e.g. ship date). Point/range predicates then touch
  O(selectivity) of the files instead of all of them. This is the batch
  equivalent of a clustered index.
- ``write_z_ordered``: multi-column locality via a Morton (Z-order) curve —
  bit-interleave the dimensions into one clustering key so range predicates
  on ANY participating column prune (a single-column sort prunes only its
  leading column). Same idea as Delta Lake's OPTIMIZE ZORDER; implemented
  here as pure column expressions (shift/and/or — codegen'd, no UDF).

Tests verify pruning with the ground truth — parquet footer statistics via
pyarrow — not just plan text.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: Sequence[Column], bits: int = 12) -> Column:
    """Morton code of non-negative integer columns: interleave ``bits``
    low bits of each column (col i contributes bit b to output bit
    ``b * len(cols) + i``). ``len(cols) * bits`` must fit in 63 bits."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def _min_max_scaled(df: DataFrame, cols: Sequence[str], bits: int) -> tuple[DataFrame, list[Column]]:
    """Scale each column to [0, 2^bits) rank space using global min/max —
    one cheap agg broadcast back into the row pipeline (no collect; the
    plan stays fully distributed). Timestamps participate via epoch µs."""
    dtypes = dict(df.dtypes)

    def num(c: str) -> Column:
        col = F.col(c)
        return (
            F.unix_micros(col).cast("double")
            if dtypes.get(c, "").startswith("timestamp")
            else col.cast("double")
        )

    top = (1 << bits) - 1
    stats = df.agg(
        *[F.min(num(c)).alias(f"__lo_{c}") for c in cols],
        *[F.max(num(c)).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    scaled = [
        F.least(
            F.lit(top),
            F.floor(
                (num(c) - F.col(f"__lo_{c}"))
                / (F.col(f"__hi_{c}") - F.col(f"__lo_{c}") + F.lit(1e-12))
                * (top + 1)
            ),
        ).cast("long")
        for c in cols
    ]
    return out, scaled


def write_range_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster on ``cols`` so parquet min/max stats become selective:
    a global range partition (sampled boundaries — one extra pass over a
    sample, not a total sort of the data) + sort within each partition."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_z_ordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustering: scale dims to rank space, interleave into a
    Morton key, range-partition + sort on the key, drop the key. Every
    participating column ends up with narrow per-file stats ranges."""
    scaled_df, scaled = _min_max_scaled(df, cols, bits)
    z = z_value(scaled, bits)
    (
        scaled_df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .select(*df.columns)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    sort_within_by: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_mb``-sized files. Returns the output file count.

    The small-files problem is the operational failure mode of S7-style
    key-routed writes and streaming foreachBatch sinks (every micro-batch
    a file): at 100 TB a scan's task count — and the NameNode/listing
    load — is file-bound, not byte-bound. Compaction = read + repartition
    to ceil(bytes/target) + rewrite; ``sort_within_by`` optionally
    re-establishes clustering (layout.write_range_clustered's property)
    during the same pass.

    Sizing uses the Hadoop FileSystem API (works on any supported
    filesystem, not just file://). Write lands in ``dst`` (a new tree):
    swap-in is the caller's atomic rename — compaction must never
    overwrite its own input mid-read.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(src)
    if sort_within_by:
        out = df.repartitionByRange(n_files, *sort_within_by).sortWithinPartitions(
            *sort_within_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("error").parquet(dst)
    dpath = jvm.org.apache.hadoop.fs.Path(dst)
    return sum(
        1
        for f in fs.listStatus(dpath)
        if f.getPath().getName().endswith(".parquet")
    )
