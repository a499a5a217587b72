"""End-to-end classification pipelines (SURVEY.md §3.1-3.2).

The reference's two flagship programs, re-expressed as single lazy plans:

  - kNN pipeline (`…/final_kNN_src`, 5 MapReduce jobs / 2 drivers):
    per-class TF jobs → IDF job → TF-IDF vector job → classify job →
    accuracy job, with per-job HDFS text materialization and manual
    intermediate-file cleanup (`…/TF_IDF_Compute.java:444-546`,
    `…/Classifier.java:27-71`).
  - NB pipeline (`…/final_NB_src`, 6 jobs / 2 drivers): per-class Count →
    ListWords vocabulary → Vectorize → TrainModel → Predict → Accuracy
    (`…/CountVec.java:48-136`, `…/NB.java:22-76`).

Here each pipeline is a composition of engine operators; the only
materialization points are explicit caches on genuinely reused smalls (the
NB model, the vocabulary). The input contract matches the reference: a
corpus DataFrame of (split, label, doc_id, line) — produced by
sources.readers.read_labeled_corpus from a folder-per-class tree, where
``split`` distinguishes train vs test (folder-name literal in the
reference, `…/TF_IDF_Compute.java:359-378`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.operators import ml as ML
from mapreduce_big_data_processing_spark.operators import text as TX


def _tokens(corpus: DataFrame) -> DataFrame:
    return TX.tokenize(
        corpus.withColumn("text", F.col("line")),
        text_col="text",
        keep_cols=["split", "label", "doc_id"],
    )


def knn_text_pipeline(
    corpus: DataFrame,
    train_split: str = "train",
    k: int = 5,
    stopwords: DataFrame | None = None,
    reference_semantics: bool = False,
) -> dict[str, DataFrame]:
    """§3.1 — TF-IDF + kNN text classification, one lazy plan per output.

    Returns {"vectors", "predictions", "accuracy"}. The reference's five
    jobs collapse: TF (A5) and IDF (A6) are subplans of the TF-IDF join
    (A7); train/test vectors split by the ``split`` column instead of
    folder-name literals; classification is a cosine top-k + majority vote
    over the *sparse* vectors via an explicit (doc × doc) sparse dot join —
    the same math as `…/KNNMapper.java:120-160` without densification.
    """
    toks = _tokens(corpus)
    if stopwords is not None:
        toks = TX.remove_stopwords(toks, stopwords)
    # doc identity = (split, label, doc) — folder path in the reference
    toks = toks.withColumn(
        "uid", F.concat_ws("/", "split", "label", "doc_id")
    )
    weights = TX.tf_idf(toks, doc_col="uid", reference_semantics=reference_semantics)
    meta = toks.select("uid", "split", "label").distinct()
    w = weights.join(meta, "uid")

    train_w = w.filter(F.col("split") == train_split).select(
        F.col("uid").alias("t_uid"), F.col("label").alias("t_label"),
        F.col("word"), F.col("tfidf").alias("t_w"),
    )
    test_w = w.filter(F.col("split") != train_split).select(
        F.col("uid").alias("q_uid"), F.col("word"), F.col("tfidf").alias("q_w"),
    )
    # sparse cosine: dot over shared terms / (||q|| · ||t||); norms via
    # per-doc window-free aggregations (one shuffle each)
    norms_t = train_w.groupBy("t_uid").agg(F.sqrt(F.sum(F.col("t_w") * F.col("t_w"))).alias("t_n"))
    norms_q = test_w.groupBy("q_uid").agg(F.sqrt(F.sum(F.col("q_w") * F.col("q_w"))).alias("q_n"))
    dots = (
        test_w.join(train_w, "word")
        .groupBy("q_uid", "t_uid", )
        .agg(F.sum(F.col("q_w") * F.col("t_w")).alias("dot"))
    )
    sims = (
        dots.join(norms_t, "t_uid")
        .join(norms_q, "q_uid")
        .join(train_w.select("t_uid", "t_label").distinct(), "t_uid")
        .select(
            "q_uid",
            "t_uid",
            "t_label",
            (F.col("dot") / (F.col("t_n") * F.col("q_n"))).alias("sim"),
        )
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("q_uid").orderBy(F.desc("sim"), F.asc("t_uid"))
    top = sims.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= k)
    votes = top.groupBy("q_uid", "t_label").agg(
        F.count(F.lit(1)).alias("votes"), F.max("sim").alias("best")
    )
    wv = Window.partitionBy("q_uid").orderBy(
        F.desc("votes"), F.desc("best"), F.asc("t_label")
    )
    predictions = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(F.col("q_uid").alias("uid"), F.col("t_label").alias("pred"))
    )
    truth = meta.filter(F.col("split") != train_split).select("uid", "label")
    joined = predictions.join(truth, "uid")
    return {
        "vectors": TX.sparse_vectors(weights, doc_col="uid"),
        "predictions": predictions,
        "accuracy": ML.accuracy(joined, "label", "pred"),
    }


def nb_text_pipeline(
    corpus: DataFrame,
    train_split: str = "train",
    stopwords: DataFrame | None = None,
    reference_semantics: bool = False,
) -> dict[str, DataFrame]:
    """§3.2 — multinomial NB text classification.

    Returns {"model": {...}, "predictions", "accuracy"}. The reference's
    six jobs (Count, ListWords, Vectorize, TrainModel, Predict, Accuracy)
    are two grouped aggregations (train), a broadcast-join scoring pass
    (predict) and a ratio aggregate (accuracy). The `!` sentinel records
    that carried corpus totals (`…/VectorizeMapper.java:39`) are ordinary
    aggregates here.
    """
    toks = _tokens(corpus)
    if stopwords is not None:
        toks = TX.remove_stopwords(toks, stopwords)
    train = toks.filter(F.col("split") == train_split)
    test = toks.filter(F.col("split") != train_split).withColumn(
        "uid", F.concat_ws("/", "split", "label", "doc_id")
    )
    model = ML.nb_train(train, label_col="label", doc_col="doc_id")
    # cache the model smalls: reused by every prediction partition
    for df in model.values():
        df.cache()
    predictions = ML.nb_predict(
        test.select(F.col("uid").alias("doc_id"), "word"),
        model,
        label_col="label",
        reference_semantics=reference_semantics,
    ).withColumnRenamed("doc_id", "uid")
    truth = test.select("uid", "label").distinct()
    joined = predictions.join(truth, "uid")
    return {
        "model": model,
        "predictions": predictions,
        "accuracy": ML.accuracy(joined, "label", "pred"),
    }
