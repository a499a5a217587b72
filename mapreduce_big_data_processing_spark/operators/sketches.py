"""Mergeable-sketch aggregates (Apache DataSketches via Spark built-ins).

The reference computes every distinct-count exactly, re-scanning raw data
for each reporting granularity (`src/…/LogAnalysis` counts per-day uniques
with one MR job per day-file). At 100 TB the scale-correct pattern is
*sketch once, merge forever*: build an HLL sketch per fine-grained cell
(one scan), then answer ANY coarser rollup by merging sketch states —
no second pass over raw data, constant memory per cell, and the merge is
associative + commutative so it partial-aggregates map-side like any sum.

Spark ships DataSketches HLL as `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` (SPARK-16484); sketches built with the same
``lgConfigK`` merge losslessly, so the daily→monthly rollup estimate is
identical to sketching the month directly — asserted in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the HLL register count: 12 → 4 KiB dense state, ~1.6% rel. err.
LG_CONFIG_K = 12


def sketch_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    sketch_col: str = "hll",
) -> DataFrame:
    """One HLL sketch of ``value`` per ``keys`` cell (the materialized cube
    a pipeline writes alongside raw data; binary, mergeable)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(LG_CONFIG_K)).alias(sketch_col)
    )


def merge_rollup(
    df: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "hll",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Roll sketches up to coarser ``keys`` by merging states — never
    touching raw rows. Output carries the point estimate."""
    merged = df.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return merged.select(
        *keys, F.hll_sketch_estimate(F.col(sketch_col)).alias(estimate_col)
    )
