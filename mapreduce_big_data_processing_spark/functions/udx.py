"""User-defined aggregate and table functions (SURVEY.md §2.11).

The reference teaches three extension points — per-row UDF (Mapper body),
UDAF (Reducer body), UDTF (one input record → many output records; the
tokenizing mappers in `src/…/WordCount.java` and the phase-1 mappers of the
kNN pipeline are exactly this shape). The engine's production paths use
built-ins (`explode`, hash aggregates) — these registrations exist to keep
the extension surface first-class and tested:

- ``geomean``: a grouped-aggregate *pandas UDAF* (Arrow-batched; one
  ``pd.Series`` per group per executor — never row-at-a-time Python).
- ``ChunkTokens``: a *Python UDTF* used via ``LATERAL`` join — the
  concat-free cousin of sequence packing: split a document into fixed-size
  token windows for context-length-bounded training corpora.

Scale notes: a pandas UDAF is NOT partial-aggregatable — Spark shuffles raw
rows to the group's reducer (fine for bounded group counts like the 5 order
priorities; wrong for high-cardinality keys, where an algebraic
reformulation — here ``exp(avg(ln(x)))`` in built-ins — keeps map-side
combine). The UDTF streams Arrow batches and emits rows lazily, so memory
is bounded by one document, not one partition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean as a grouped-agg pandas UDAF (Arrow-batched).

    §2.11 escape-hatch DEMO, not the production path: a pandas UDAF has
    NO partial aggregation — every raw row shuffles to its group's
    reducer — so it is only appropriate for bounded group counts (the
    5-priority orders rollup it demos on). The scale-safe algebraic form
    is pure built-ins and partial-aggregates map-side:
    ``F.exp(F.avg(F.log(col)))`` — use that anywhere group cardinality
    or rows-per-group is data-sized."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))


@F.udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkTokens:
    """UDTF: one document row → one row per fixed-size token window.

    Whitespace-token chunking with no overlap; the last chunk is ragged.
    Mirrors the reference's record-expanding mappers (one input → many
    ``(key, value)`` emissions) as a declarative table function usable from
    SQL via ``LATERAL``.
    """

    CHUNK = 64

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        toks = (text or "").split(" ")
        for i in range(0, len(toks), self.CHUNK):
            window = toks[i : i + self.CHUNK]
            yield i // self.CHUNK, " ".join(window), len(window)


def register_udx(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
