"""Column-expression helpers shared across operator modules.

Includes the sparse-vector string codec matching the reference's on-disk
format `idx:val idx:val …` (`…/TF_IDF_Compute.java:382`, parsed back at
`…/final_kNN_src/phase2/KNNMapper.java:64-72`), so corpora produced by the
reference are directly ingestible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canon_text(text: Column) -> Column:
    """Normalized content form used by fingerprints/dedup: lowercase,
    whitespace collapsed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def hash60(col: Column, portable: bool = False) -> Column:
    """Non-negative 60-bit hash. ``portable=True`` → md5-derived (bit-equal
    in any engine, used by oracle tests); default xxhash64 (JVM-cheap)."""
    if portable:
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    return F.abs(F.xxhash64(col))


def encode_sparse_vector(vec: Column) -> Column:
    """array<struct<idx,val>> → `idx:val idx:val …` (reference line format)."""
    return F.array_join(
        F.transform(
            vec, lambda s: F.concat_ws(":", s["idx"].cast("string"), s["val"].cast("string"))
        ),
        " ",
    )


def decode_sparse_vector(s: Column) -> Column:
    """`idx:val idx:val …` → array<struct<idx int, val double>>."""
    return F.transform(
        F.split(F.trim(s), " +"),
        lambda p: F.struct(
            F.split(p, ":")[0].cast("int").alias("idx"),
            F.split(p, ":")[1].cast("double").alias("val"),
        ),
    )


def sparse_dot(a: Column, b: Column) -> Column:
    """Dot product of two sorted sparse vectors (array<struct<idx,val>>)
    via map conversion — JVM-side, no UDF."""
    ma = F.map_from_entries(a)
    return F.aggregate(
        b,
        F.lit(0.0),
        lambda acc, s: acc
        + F.coalesce(F.element_at(ma, s["idx"]), F.lit(0.0)) * s["val"],
    )
