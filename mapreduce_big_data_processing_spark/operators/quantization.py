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
    # two projections: aliasing an expression AS "scale" in the same select
    # would lateral-resolve the err expression's `scale` reference (Spark
    # lateral column aliases), perturbing the reconstruction. Values are
    # emitted RAW: rounding here and again in a consumer double-rounds,
    # which manufactures exact-half decimal boundaries where Spark's
    # BigDecimal HALF_UP and DuckDB's float rounding disagree (seen at
    # sf0.1) — raw doubles are never exactly on a boundary.
    raw = q.select(F.col(id_col), F.col("scale").alias("_s"), err.alias("_e"))
    return raw.select(
        F.col(id_col),
        F.col("_s").alias("scale"),
        F.col("_e").alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the FAISS IVFPQ building block
# ---------------------------------------------------------------------------


def _subvectors(vec: Column, m: int) -> Column:
    """Split an array<float> into m contiguous array<double> subvectors
    (last one ragged if dim % m != 0)."""
    d = F.size(vec)
    sub_len = F.ceil(d / F.lit(float(m))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.transform(
            F.slice(vec, (s * sub_len + 1).cast("int"), sub_len),
            lambda x: x.cast("double"),
        ),
    )


def _cb_matrix(codebook_rows: list, m: int):
    """Collected (sub, cid, c) rows → (m, k, dsub) ndarray."""
    import numpy as np

    kk = max(r["cid"] for r in codebook_rows) + 1
    dsub = max(len(r["c"]) for r in codebook_rows)
    cb = np.zeros((m, kk, dsub))
    for r in codebook_rows:
        cb[r["sub"], r["cid"], : len(r["c"])] = r["c"]
    return cb


def _sub_view(mat, m: int, dsub: int):
    """(b, d) float matrix → (b, m, dsub), zero-padded to m*dsub."""
    import numpy as np

    b, d = mat.shape
    if d < m * dsub:
        mat = np.concatenate([mat, np.zeros((b, m * dsub - d))], axis=1)
    return mat.reshape(b, m, dsub)


def _nearest_cids(sub, cb):
    """(b, m, dsub) × (m, k, dsub) → (b, m) argmin-distance codes.
    np.argmin takes the FIRST minimum — lowest cid under ties."""
    import numpy as np

    # |v-c|² = |v|² - 2 v·c + |c|²; |v|² is constant per argmin
    dots = np.einsum("bmd,mkd->bmk", sub, cb)
    c2 = (cb * cb).sum(axis=2)  # (m, k)
    return np.argmin(c2[None, :, :] - 2.0 * dots, axis=2)


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace k-means codebooks (Jégou et al., PAMI'11): the
    vector is cut into m subvectors; each subspace gets k centroids; a code
    is then m small ints — 32× smaller than float32 at m=8,k=16 over 64 dims.

    All m subspace k-means advance together: per iteration, ONE narrow
    Arrow stage (no shuffle, no join) assigns every vector's m subvectors
    to centroids via a batched matmul and emits per-batch partial
    (sum, count) stats; the m×k×dsub reduce happens on the driver, which
    owns the (broadcast-sized) codebook state between rounds. Deterministic
    init: the k lowest ids' subvectors. Output codebook:
    (sub, cid, c array<double>) — m×k rows.

    Cites the reference's K-Means loop semantics (`ppt/Ch9….pdf p.21-39`);
    the partial (sum, count) per batch is the combiner pattern
    (`ppt/Ch9….pdf p.24-28`) vectorized through Arrow.
    """
    import numpy as np

    spark = emb.sparkSession
    pts = emb.select(id_col, vec_col)
    # deterministic init: the k lowest ids' subvectors (tiny ordered take)
    seed = pts.orderBy(F.asc(id_col)).limit(k).collect()
    d = len(seed[0][vec_col])
    dsub = -(-d // m)
    cb = _sub_view(
        np.array([r[vec_col] for r in seed], dtype="float64"), m, dsub
    ).transpose(1, 0, 2).copy()  # (m, k, dsub)

    # per-iteration: ONE narrow Arrow stage emitting m×k partial
    # (sum, count) stats per batch; the m×k×dsub reduce happens on the
    # driver (codebook-sized, not data-sized). No shuffle anywhere.
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cb)

        def stats(batches):
            import numpy as np
            import pandas as pd

            cb_ = bc.value
            m_, k_, ds_ = cb_.shape
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sub = _sub_view(
                    np.vstack(pdf[vec_col].to_numpy()).astype("float64"), m_, ds_
                )
                codes = _nearest_cids(sub, cb_)  # (b, m)
                s = np.zeros((m_, k_, ds_))
                n = np.zeros((m_, k_), dtype="int64")
                for mi in range(m_):
                    np.add.at(s[mi], codes[:, mi], sub[:, mi, :])
                    np.add.at(n[mi], codes[:, mi], 1)
                yield pd.DataFrame(
                    {
                        "sub": np.repeat(np.arange(m_), k_),
                        "cid": np.tile(np.arange(k_), m_),
                        "s": list(s.reshape(m_ * k_, ds_)),
                        "n": n.reshape(m_ * k_),
                    }
                )

        parts = pts.mapInPandas(
            stats, schema="sub int, cid int, s array<double>, n long"
        ).collect()
        tot_s = np.zeros_like(cb)
        tot_n = np.zeros(cb.shape[:2], dtype="int64")
        for r in parts:
            tot_s[r["sub"], r["cid"]] += np.asarray(r["s"])
            tot_n[r["sub"], r["cid"]] += r["n"]
        nonempty = tot_n > 0  # empty clusters keep their previous centroid
        cb[nonempty] = tot_s[nonempty] / tot_n[nonempty][:, None]

    def sub_len(s: int) -> int:  # trailing subspaces may be ragged/empty
        return max(0, min(dsub, d - s * dsub))

    return spark.createDataFrame(
        [
            (s, c, [float(x) for x in cb[s, c, : sub_len(s)]])
            for s in range(m)
            for c in range(cb.shape[1])
        ],
        "sub int, cid int, c array<double>",
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """Encode vectors to (id, codes array<int> length m): nearest centroid
    per subspace (argmin ties → lowest cid). One narrow Arrow stage — the
    closure-broadcast codebook is probed with a batched matmul; no shuffle,
    no join. ``keep_cols`` pass through unchanged (e.g. an IVF ``bucket``
    column, so index build = one assign stage + one encode stage)."""
    spark = emb.sparkSession
    cb = _cb_matrix(codebook.collect(), m)
    bc = spark.sparkContext.broadcast(cb)
    keep = list(keep_cols)

    def encode(batches):
        import numpy as np
        import pandas as pd

        cb_ = bc.value
        m_, _, ds_ = cb_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sub = _sub_view(
                np.vstack(pdf[vec_col].to_numpy()).astype("float64"), m_, ds_
            )
            codes = _nearest_cids(sub, cb_).astype("int32")
            out = {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            for c in keep:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    dtypes = dict(emb.dtypes)
    keep_schema = "".join(f", {c} {dtypes[c]}" for c in keep)
    return emb.select(id_col, vec_col, *keep).mapInPandas(
        encode, schema=f"{id_col} {dtypes[id_col]}, codes array<int>{keep_schema}"
    )


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebook_rows: list,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric PQ search (ADC): per query, precompute an m×k lookup
    table of subspace dot-products against every centroid; a corpus row's
    score is then m table gathers + the norm LUT — no float vector is ever
    read. The codes column (m bytes/row) is the ONLY corpus data scanned:
    at 100 TB this is the difference between scanning 3 KB/row and 8 B/row.

    codebook_rows: (sub, cid, c) rows (m×k — driver-small by design; the
    codebook IS broadcast state). The per-query LUT is computed by an
    Arrow-batched pandas stage over the query table — the query side is
    never collected to the driver, so it may itself be a table — and the
    LUT gathers run JVM-side (element_at over the broadcast-joined lut
    column). Scores are cosine against the PQ reconstruction. Output:
    (query_id, vec_id, score, rank).
    """
    import numpy as np

    cb = _cb_matrix(codebook_rows, m)  # (m, kk, dsub)
    _, kk, dsub = cb.shape
    cent_norm2 = (cb * cb).sum(axis=2)  # (m, kk)
    spark = corpus_codes.sparkSession
    bc = spark.sparkContext.broadcast(cb)

    def luts(batches):
        import numpy as np
        import pandas as pd  # noqa: F401

        cb_ = bc.value
        m_, kk_, ds_ = cb_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.vstack(pdf["__qvec"].to_numpy()).astype("float64")
            nq, d = qm.shape
            pad = m_ * ds_ - d
            if pad:
                qm = np.concatenate([qm, np.zeros((nq, pad))], axis=1)
            lut = np.einsum("qmd,mkd->qmk", qm.reshape(nq, m_, ds_), cb_)
            pdf = pdf.copy()
            pdf["__lut"] = list(lut.reshape(nq, m_ * kk_))
            pdf["__qnorm"] = np.maximum(np.linalg.norm(qm, axis=1), 1e-12)
            yield pdf[[query_id_col, "__lut", "__qnorm"]]

    qid_type = dict(queries.dtypes)[query_id_col]
    qlut = queries.select(query_id_col, F.col(vec_col).alias("__qvec")).mapInPandas(
        luts, schema=f"`{query_id_col}` {qid_type}, __lut array<double>, __qnorm double"
    )

    # JVM-side ADC: m gathers from the joined lut column per corpus row
    score = _adc_score_expr(kk, cent_norm2)
    scored = (
        corpus_codes.select(id_col, "codes")
        .crossJoin(F.broadcast(qlut))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, score.alias("score"))
    )
    return _ranked_topk(scored, k, id_col, query_id_col)


def _adc_score_expr(kk: int, cent_norm2) -> Column:
    """ADC cosine(query, PQ-reconstruction) from a joined ``__lut`` column:
    Σ_m lut[sub, code] / (‖recon‖·‖q‖), all via JVM-side `element_at`
    gathers — the float corpus vector is never touched."""
    cn2_flat = F.array(*[F.lit(float(x)) for x in cent_norm2.reshape(-1)])
    dots = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.col("__lut"), (i * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    recon2 = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(cn2_flat, (i * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dots / (F.greatest(F.sqrt(recon2), F.lit(1e-12)) * F.col("__qnorm"))


def _ranked_topk(scored: DataFrame, k: int, id_col: str, query_id_col: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def ivf_pq_index(
    corpus: DataFrame,
    centroids: list,
    codebook: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF-PQ index table (id, bucket, codes): IVF coarse
    assignment (nearest centroid) then PQ codes, two narrow Arrow stages —
    no shuffle. This is the stored layout of the FAISS IVFPQ scale path: at
    100 TB the float column is scanned ONCE here, and queries touch only
    (bucket, m-byte codes) — with the bucket as a partition/cluster key,
    probes prune partitions instead of scanning the corpus."""
    from mapreduce_big_data_processing_spark.operators import similarity as S

    assigned = S.ivf_assign(corpus, centroids, id_col, vec_col)
    return pq_encode(assigned, codebook, m, id_col, vec_col, keep_cols=("bucket",))


def ivf_pq_topk(
    index: DataFrame,
    queries: DataFrame,
    centroids: list,
    codebook_rows: list,
    k: int = 10,
    n_probe: int = 4,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ search (Jégou et al., PAMI'11 — the standard composed layout):
    each query probes its ``n_probe`` nearest coarse centroids and scores
    ADC only inside those buckets, so the old codes×queries crossJoin
    becomes a bucket equi-join against the ``ivf_pq_index`` table. ONE
    Arrow stage over the query table computes probe lists AND LUTs (the
    centroid matrix and codebook are tiny broadcast state — the query side
    is never collected, it may itself be a table); scoring is JVM-side
    `element_at` gathers. Output: (query_id, vec_id, score, rank)."""
    import numpy as np

    cb = _cb_matrix(codebook_rows, m)  # (m, kk, dsub)
    _, kk, dsub = cb.shape
    cent_norm2 = (cb * cb).sum(axis=2)  # (m, kk)
    cent = np.asarray(centroids, dtype="float64")
    cn = np.linalg.norm(cent, axis=1)
    spark = index.sparkSession
    bc = spark.sparkContext.broadcast((cb, cent, cn, n_probe))

    def probes_and_luts(batches):
        import numpy as np
        import pandas as pd  # noqa: F401

        cb_, cm, cnn, np_ = bc.value
        m_, kk_, ds_ = cb_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.vstack(pdf["__qvec"].to_numpy()).astype("float64")
            # coarse probes: n_probe nearest centroids by cosine, stable
            # order (ties → lowest cid) — same argsort as similarity.ivf_topk
            vn = np.linalg.norm(qm, axis=1)
            sims = (qm @ cm.T) / np.outer(vn, cnn)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :np_]
            # ADC LUTs: per-subspace dot of the query against every centroid
            nq, d = qm.shape
            pad = m_ * ds_ - d
            qp = np.concatenate([qm, np.zeros((nq, pad))], axis=1) if pad else qm
            lut = np.einsum("qmd,mkd->qmk", qp.reshape(nq, m_, ds_), cb_)
            pdf = pdf.copy()
            pdf["bucket"] = [row.astype("int32").tolist() for row in order]
            pdf["__lut"] = list(lut.reshape(nq, m_ * kk_))
            pdf["__qnorm"] = np.maximum(vn, 1e-12)
            yield pdf[[query_id_col, "bucket", "__lut", "__qnorm"]]

    qid_type = dict(queries.dtypes)[query_id_col]
    qlut = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .mapInPandas(
            probes_and_luts,
            schema=(
                f"`{query_id_col}` {qid_type}, bucket array<int>, "
                "__lut array<double>, __qnorm double"
            ),
        )
        .withColumn("bucket", F.explode("bucket"))
    )

    score = _adc_score_expr(kk, cent_norm2)
    scored = (
        index.select(id_col, "bucket", "codes")
        .join(F.broadcast(qlut), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, score.alias("score"))
    )
    return _ranked_topk(scored, k, id_col, query_id_col)


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
