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


def _batch_scored_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    exclude_self: bool = True,
) -> DataFrame:
    """Per-partition-batch top-k candidates per query, scored with a NumPy
    matmul over Arrow batches (mapInPandas). The query matrix is closure-
    broadcast (small side); the corpus streams — no shuffle, no per-element
    lambda evaluation (the expression-tree cosine is ~50× slower per pair).
    Global top-k over the union of batch-local top-k is exact.
    """
    q_rows = queries.select(query_id_col, vec_col).collect()  # small side
    import numpy as np

    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype="float64")
    q_norm = np.linalg.norm(q_mat, axis=1)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        import numpy as np
        import pandas as pd

        ids, qm, qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            cn = np.linalg.norm(c, axis=1)
            sims = (c @ qm.T) / np.outer(cn, qn)  # (batch, q)
            out = {"qid": [], "cid": [], "cosine": []}
            cids = pdf[id_col].to_numpy()
            for j, qid in enumerate(ids):
                col = sims[:, j]
                mask = cids != qid if exclude_self else np.ones(len(cids), bool)
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                top = idx[np.argsort(-col[idx], kind="stable")[:k]]
                out["qid"].extend([qid] * len(top))
                out["cid"].extend(cids[top])
                out["cosine"].extend(col[top])
            yield pd.DataFrame(out)

    id_type = dict(corpus.dtypes)[id_col]
    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"qid {id_type}, cid {id_type}, cosine double"
    )
    return cand.select(
        F.col("qid").alias(query_id_col), F.col("cid").alias(id_col), "cosine"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: every query scored against every corpus vector.

    ``queries`` has (query_id, embedding); it broadcasts, the corpus — the
    100 TB side — streams through one NumPy-vectorized stage emitting
    batch-local top-k candidates; a window takes the global top-k (exact:
    the global winner is a batch winner). Output: (query_id, vec_id,
    cosine, rank).
    """
    scored = _batch_scored_candidates(
        corpus, queries, k, id_col, vec_col, query_id_col
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Hyperplane-signature expression: bit i = sign(<v, plane_i>)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.transform(vec, lambda x: x.cast("double")), plane) > 0).cast("bigint")
        sig = sig + F.shiftleft(bit, i)
    return sig


def hyperplane_signature(
    df: DataFrame, planes: list[list[float]], vec_col: str = "embedding", out: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(<v, plane_i>).

    ``planes`` are driver-provided constants (seeded NumPy normals embedded
    as literals), so signatures are deterministic and cluster-reproducible.
    """
    return df.withColumn(out, _signature_expr(F.col(vec_col), planes))


def _multiprobe_buckets(
    q_rows: list[tuple], planes: list[list[float]], n_probe: int
) -> list[tuple]:
    """Query-directed multi-probe bucket list (Lv et al., VLDB'07): probe
    the query's own bucket first, then buckets reached by flipping the
    lowest-|margin| signature bits, in increasing sum-of-squared-margin
    cost. Flip sets are capped at 3 bits (cost-sorted, ample for practical
    n_probe); ``n_probe >= 2**L`` degenerates to scanning every bucket,
    which makes the ANN exact. Runs driver-side over the (small) query set.
    """
    from itertools import combinations

    import numpy as np

    P = np.asarray(planes, dtype="float64")
    L = len(planes)
    flip_sets: list[tuple[tuple[int, ...], int]] = [((), 0)]
    for r in range(1, min(L, 3) + 1):
        for comb in combinations(range(L), r):
            mask = 0
            for i in comb:
                mask |= 1 << i
            flip_sets.append((comb, mask))
    out = []
    for qid, vec in q_rows:
        d = P @ np.asarray(vec, dtype="float64")
        base = sum(1 << i for i in range(L) if d[i] > 0)
        if n_probe >= (1 << L):
            out.extend((qid, b) for b in range(1 << L))
            continue
        cost2 = d * d
        ranked = sorted(flip_sets, key=lambda fs: sum(cost2[i] for i in fs[0]))
        out.extend((qid, base ^ mask) for _, mask in ranked[:n_probe])
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: bucket by hyperplane signature, exact re-rank per bucket.

    ``n_probe`` > 1 enables query-directed multi-probe (flip the
    lowest-margin signature bits): recall grows with n_probe at the cost of
    probing more buckets, and n_probe ≥ 2**len(planes) is exact. The corpus
    keeps ONE signature per vector either way — multi-probe expands only the
    (small, broadcast) query side, so the 100 TB side is never replicated.
    The scale win is that the join is an equi-join on bucket instead of a
    crossJoin. Output schema matches brute_force_topk.
    """
    cb = hyperplane_signature(corpus, planes, vec_col)
    if n_probe > 1:
        q_rows = [
            (r[0], r[1]) for r in queries.select(query_id_col, vec_col).collect()
        ]
        probes = _multiprobe_buckets(q_rows, planes, n_probe)
        spark = corpus.sparkSession
        qid_type = dict(queries.dtypes)[query_id_col]
        probe_df = spark.createDataFrame(
            probes, f"{query_id_col} {qid_type}, bucket bigint"
        )
        qb = probe_df.join(
            queries.select(query_id_col, F.col(vec_col).alias("__qvec")),
            query_id_col,
        )
    else:
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


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """IVF bucketing: assign each vector to its nearest centroid (NumPy
    batch pass). ``centroids`` is a small driver-side list — from
    operators.ml.kmeans output or a deterministic sample."""
    import numpy as np

    c = np.array(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((c, cn))

    def assign(batches):
        import numpy as np
        import pandas as pd

        cm, cnn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            vn = np.linalg.norm(v, axis=1)
            sims = (v @ cm.T) / np.outer(vn, cnn)
            pdf = pdf.copy()
            pdf[out] = np.argmax(sims, axis=1).astype("int32")
            yield pdf

    fields = ", ".join(f"{c_} {t}" for c_, t in corpus.dtypes)
    return corpus.mapInPandas(assign, schema=f"{fields}, {out} int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k: score each query only against the ``n_probe`` nearest
    centroid buckets. Recall grows with n_probe (n_probe = n_centroids is
    exact). The corpus-side win at scale: the bucket column is a partition/
    cluster key, so probes prune partitions instead of scanning 100 TB.
    Output schema matches brute_force_topk."""
    import numpy as np

    cb = ivf_assign(corpus, centroids, id_col, vec_col)
    c = np.array(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    q_rows = queries.select(query_id_col, vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.array(r[1], dtype="float64")
        sims = (c @ qv) / (cn * np.linalg.norm(qv))
        for b in np.argsort(-sims)[:n_probe]:
            probe_rows.append((r[0], int(b)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, f"{query_id_col} long, bucket int")
    # restrict the corpus to probed buckets, then exact-rescore per query
    probed = cb.join(F.broadcast(probes.select("bucket").distinct()), "bucket")
    cand = _batch_scored_candidates(
        probed, queries, k, id_col, vec_col, query_id_col
    )
    # keep only (query, vector) pairs whose bucket was probed for THAT query
    cand = cand.join(
        cb.select(F.col(id_col), "bucket"), id_col
    ).join(F.broadcast(probes), [query_id_col, "bucket"], "left_semi")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    plane_tables: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    With ``planes``, pairs generate within LSH buckets via expression-level
    joins (the 100 TB path — no broadcast of the corpus). With
    ``plane_tables`` (T independent plane sets), OR-amplified multi-table
    LSH: a pair is a candidate if it collides in ANY table — recall grows
    with T while each table's bucket join stays an equi-join; implemented
    as ONE shuffle on (table_id, bucket) via posexplode of the per-table
    signature array, not T separate joins. Without either, exact all-pairs:
    the corpus streams against a broadcast copy of itself through a NumPy
    matmul stage (bounded-corpus path; the 12.5 M-pair expression-tree
    cosine this replaced was ~100× slower).
    """
    if plane_tables is not None:
        def tabled(side: str):
            s = corpus.select(
                F.col(id_col).alias(f"id_{side}"),
                F.col(vec_col).alias(f"__v{side}"),
            ).withColumn(
                "__sigs",
                F.array(
                    *[_signature_expr(F.col(f"__v{side}"), t) for t in plane_tables]
                ),
            )
            return s.select(
                f"id_{side}",
                f"__v{side}",
                F.posexplode("__sigs").alias("table_id", "bucket"),
            )

        pairs = (
            tabled("a")
            .join(tabled("b"), ["table_id", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])  # collisions in >1 table
        )
        return (
            pairs.withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    if planes is not None:
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        a = hyperplane_signature(a, planes, "__va")
        b = hyperplane_signature(b, planes, "__vb")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
        return (
            pairs.withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    rows = corpus.select(id_col, vec_col).collect()
    import numpy as np

    all_ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((all_ids, mat, norms))

    def pairs_fn(batches):
        import numpy as np
        import pandas as pd

        ids, m, n = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            cn = np.linalg.norm(c, axis=1)
            sims = (c @ m.T) / np.outer(cn, n)
            cids = pdf[id_col].to_numpy()
            ra, rb, rc = [], [], []
            for i in range(len(cids)):
                mask = (ids > cids[i]) & (sims[i] >= threshold)
                hit = np.nonzero(mask)[0]
                ra.extend([cids[i]] * len(hit))
                rb.extend(ids[hit])
                rc.extend(sims[i][hit])
            yield pd.DataFrame({"id_a": ra, "id_b": rb, "cosine": rc})

    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        pairs_fn, schema=f"id_a {id_type}, id_b {id_type}, cosine double"
    )
