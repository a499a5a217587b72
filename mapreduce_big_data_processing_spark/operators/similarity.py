"""Embedding similarity search (driver extension; BASELINE.json north star).

The reference's closest surface is the kNN classifier's broadcast
nested-loop cosine scoring (`…/final_kNN_src/phase2/KNNMapper.java:120-160`);
these operators generalize it to ANN over an `array<float>` column.

Paths:
  - brute-force top-k: broadcast the (small) query set against the corpus —
    the exact baseline; scales in corpus size, not query-set size;
  - LSH-bucketed (random hyperplane): equi-join on signature buckets, then
    exact re-rank inside buckets — the 100 TB path (probes > 1 bucket via
    multiple tables);
  - IVF (centroid-bucketed): kmeans centroids → probe nearest centroids —
    built on operators.ml.kmeans (round 2).

Dot products run JVM-side via `F.zip_with`/`F.aggregate` (no Python UDF in
the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in declared array order (deterministic fold, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: every query scored against every corpus vector.

    ``queries`` has (query_id, embedding); it is broadcast, so the corpus —
    the 100 TB side — streams through one stage with no shuffle until the
    per-query top-k window. Output: (query_id, vec_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        cosine(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplane_signature(
    df: DataFrame, planes: list[list[float]], vec_col: str = "embedding", out: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(<v, plane_i>).

    ``planes`` are driver-provided constants (seeded NumPy normals embedded
    as literals), so signatures are deterministic and cluster-reproducible.
    """
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), plane) > 0).cast("bigint")
        sig = sig + F.shiftleft(bit, i)
    return df.withColumn(out, sig)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: bucket by hyperplane signature, exact re-rank per bucket.

    Recall < 1 by construction (single probe); the scale win is that the
    join is an equi-join on bucket instead of a crossJoin. Output schema
    matches brute_force_topk.
    """
    cb = hyperplane_signature(corpus, planes, vec_col)
    qb = hyperplane_signature(
        queries.select(query_id_col, F.col(vec_col).alias("__qvec")), planes, "__qvec"
    )
    scored = cb.join(F.broadcast(qb), "bucket").filter(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        query_id_col,
        id_col,
        cosine(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    With ``planes``, pairs are generated within LSH buckets (scale path);
    without, an all-pairs self-join (exact; only for bounded corpora).
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if planes is not None:
        a = hyperplane_signature(a, planes, "__va")
        b = hyperplane_signature(b, planes, "__vb")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
