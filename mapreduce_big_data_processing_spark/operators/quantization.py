"""Embedding quantization (driver extension; BASELINE.json north star).

At 100 TB an `array<float>` embedding column is the dominant storage/shuffle
cost of a similarity pipeline: 768 dims × 4 B = 3 KB/row. Symmetric int8
quantization (per-vector max-abs scale, the FAISS `SQ8`/ONNX dynamic-range
scheme) cuts that 4× with <0.5% cosine error, and the codes column shuffles
and broadcasts 4× cheaper through every downstream LSH/IVF/top-k stage.

Everything here is expression-level (JVM codegen; no UDF):
  - quantize: scale = max|x|/127, code_i = floor(x_i/scale + 0.5) — the
    explicit floor(+0.5) form because round() half-even/half-up behavior
    differs across engines and the DuckDB oracle must reproduce codes
    bit-for-bit;
  - dequantize: code_i * scale;
  - search: dequantize into the existing NumPy-matmul top-k stage
    (similarity.brute_force_topk) — asymmetric scoring: float queries
    against reconstructed corpus vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: guard for all-zero vectors (scale would be 0 → div-by-zero NaNs)
_EPS = 1e-12


def _scale(vec: Column) -> Column:
    """Per-vector max-abs / 127, in double, floored at _EPS."""
    m = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.greatest(m / F.lit(127.0), F.lit(_EPS))


def quantize(
    emb: DataFrame, vec_col: str = "embedding", codes_col: str = "codes"
) -> DataFrame:
    """Add (codes array<int> in [-127,127], scale double); keeps all columns.

    floor(x/scale + 0.5) rounds half-up for positives and half-toward-zero
    for negatives — identical in Spark and DuckDB, unlike round().
    """
    sc = _scale(F.col(vec_col))
    codes = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") / sc + F.lit(0.5)).cast("int"),
    )
    return emb.withColumn("scale", sc).withColumn(codes_col, codes)


def dequantize(codes: Column, scale: Column) -> Column:
    """codes[i] * scale → array<double> reconstruction."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quantization_error(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector reconstruction error: (id, scale, max_abs_err).

    max_abs_err ≤ scale/2 by construction — the test and the DuckDB oracle
    both check the bound, which pins the rounding semantics exactly.
    """
    q = quantize(emb, vec_col)
    err = F.array_max(
        F.zip_with(
            dequantize(F.col("codes"), F.col("scale")),
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            lambda r, o: F.abs(r - o),
        )
    )
    # two projections: aliasing round(scale) AS "scale" in the same select
    # would lateral-resolve the err expression's `scale` to the ROUNDED
    # value (Spark lateral column aliases), perturbing the reconstruction
    raw = q.select(F.col(id_col), F.col("scale").alias("_s"), err.alias("_e"))
    return raw.select(
        F.col(id_col),
        F.round("_s", 9).alias("scale"),
        F.round("_e", 9).alias("max_abs_err"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric quantized ANN: float queries vs int8-reconstructed corpus.

    The corpus side carries only (id, codes, scale) — the 4×-smaller
    representation a 100 TB deployment would store — reconstructed
    on the fly (O(n·d) JVM transform) into the batched NumPy top-k stage.
    Output: (query_id, vec_id, cosine, rank) — cosine against the
    *reconstructed* vector (recall vs exact is a test assertion, not a
    semantics promise).
    """
    from mapreduce_big_data_processing_spark.operators import similarity as S

    deq = quantize(corpus, vec_col).select(
        id_col, dequantize(F.col("codes"), F.col("scale")).alias(vec_col)
    )
    return S.brute_force_topk(
        deq, queries, k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col
    )
