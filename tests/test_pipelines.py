"""End-to-end pipeline tests (SURVEY §3.1-3.2): folder-per-class corpus on
disk → corpus reader → full classification pipelines → accuracy."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.plans import pipelines as P
from mapreduce_big_data_processing_spark.sources import readers as RD

CORPUS = {
    ("train", "sci"): {
        "d1.txt": "atoms electrons quantum physics\nquantum theory",
        "d2.txt": "electrons orbit atoms\nphysics experiment",
        "d3.txt": "quantum physics experiment atoms",
    },
    ("train", "rec"): {
        "d4.txt": "bikes racing wheels\nracing helmet",
        "d5.txt": "wheels bikes road racing",
        "d6.txt": "helmet road bikes",
    },
    ("test", "sci"): {
        "t1.txt": "quantum atoms experiment",
        "t2.txt": "physics electrons",
    },
    ("test", "rec"): {
        "t3.txt": "racing bikes helmet",
    },
}


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    for (split, label), docs in CORPUS.items():
        d = os.path.join(root, split, label)
        os.makedirs(d, exist_ok=True)
        for name, text in docs.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
    # split folder = grandparent (depth -3), label = parent (-2)
    parts = F.split(F.input_file_name(), "/")
    return (
        spark.read.option("recursiveFileLookup", "true")
        .text(root)
        .select(
            F.element_at(parts, -3).alias("split"),
            F.element_at(parts, -2).alias("label"),
            F.element_at(parts, -1).alias("doc_id"),
            F.col("value").alias("line"),
        )
    )


def test_corpus_layout(corpus):
    rows = corpus.select("split", "label", "doc_id").distinct().collect()
    assert len(rows) == 9
    assert {r.split for r in rows} == {"train", "test"}


def test_knn_pipeline_end_to_end(corpus):
    out = P.knn_text_pipeline(corpus, train_split="train", k=3)
    preds = {r.uid: r.pred for r in out["predictions"].collect()}
    assert preds == {
        "test/sci/t1.txt": "sci",
        "test/sci/t2.txt": "sci",
        "test/rec/t3.txt": "rec",
    }
    assert out["accuracy"].collect()[0].accuracy == 1.0
    vecs = out["vectors"].collect()
    assert len(vecs) == 9  # one sparse vector per document
    assert all(len(r.vector) > 0 for r in vecs)


def test_nb_pipeline_end_to_end(corpus):
    out = P.nb_text_pipeline(corpus, train_split="train")
    preds = {r.uid: r.pred for r in out["predictions"].collect()}
    assert preds == {
        "test/sci/t1.txt": "sci",
        "test/sci/t2.txt": "sci",
        "test/rec/t3.txt": "rec",
    }
    assert out["accuracy"].collect()[0].accuracy == 1.0


def test_nb_pipeline_quirk_mode_runs(corpus):
    out = P.nb_text_pipeline(corpus, train_split="train", reference_semantics=True)
    assert out["predictions"].count() == 3


def test_knn_pipeline_with_stopwords(spark, corpus):
    stop = spark.createDataFrame([("road",)], "word string")
    out = P.knn_text_pipeline(corpus, train_split="train", k=3, stopwords=stop)
    assert out["predictions"].count() == 3
