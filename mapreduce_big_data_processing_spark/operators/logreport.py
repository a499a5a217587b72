"""Log-analysis report formats (SURVEY.md §5.3 format contracts).

The log project's outputs are format-specified (`…课程设计1-日志分析.pdf
p.2-3`): hourly windows rendered as `start-end` hyphen ranges with
`key:count` lines (task 1), per-key files named from the key — per-IP
`172.22.49.26.txt`, per-URL with `/` → `-` (`tour-category-query.txt`)
(tasks 2-3). These functions produce the formatted columns; the per-key
file routing is `write.partitionBy` on the computed file-key column
(sources.writers.write_partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.operators import windows as WIN


def hourly_report_lines(
    df: DataFrame, ts: str = "ts", key: str = "event_type"
) -> DataFrame:
    """Task-1 format: one line per (hour-window, key) as
    `HH:00-HH+1:00<TAB>key:count` → columns (window_range, line)."""
    counts = WIN.windowed_count(df, ts, "1 hour", key)
    rng = F.concat_ws(
        "-",
        F.date_format("window_start", "yyyy-MM-dd HH:mm"),
        F.date_format("window_end", "HH:mm"),
    )
    return counts.select(
        rng.alias("window_range"),
        F.concat_ws(":", F.col(key), F.col("cnt").cast("string")).alias("line"),
    )


def per_key_file_column(
    df: DataFrame, key: str, out: str = "file_key", suffix: str = ".txt"
) -> DataFrame:
    """Tasks 2-3 file naming: the routing key becomes a filesystem-safe
    file name (`/` → `-`, as in `tour-category-query.txt`); write with
    `partitionBy(out)` to get one directory per key — the modern form of
    MultipleTextOutputFormat's per-key files (`ppt/Ch7….pdf p.69-71`)."""
    safe = F.regexp_replace(
        F.regexp_replace(F.col(key).cast("string"), "^/", ""), "/", "-"
    )
    return df.withColumn(out, F.concat(safe, F.lit(suffix)))
