"""r11 optimization-equivalence tests: every size-gated fast path added in
the r11 optimization round must return exactly the rows its ungated
(string / single-pass) sibling returns.

- label_propagation dictionary-encodes node ids to ORDER-PRESERVING rank
  int64s above ``_ENCODE_MIN_EDGES`` (labels are values AND keys, and the
  tie-break is ``asc(label)`` — hash ids would resolve ties differently);
- ``queries._word_graph`` vocab-encodes tokens to xxhash64 int64 above
  ``_GRAPH_ENCODE_MIN_BYTES`` so the pair self-join/aggregate and the
  downstream graph consumers run on ints and decode vertex-sized output;
- ``curation.chunk_dedup`` switches to the keys-not-payload split (guide
  §8) above ``_SPLIT_SHUFFLE_MIN_BYTES``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import queries as Q
from mapreduce_big_data_processing_spark.operators import curation as C
from mapreduce_big_data_processing_spark.operators import graph as G


def test_lpa_encoded_matches_string(spark, monkeypatch):
    """Encoded LPA ≡ string LPA, including a same-score TIE at node m
    (labels a and b, equal summed weight): the ascending-label tie-break
    must pick 'a' on both paths — the property that forces rank ids."""
    edges = [
        ("a", "m", 1.0),
        ("b", "m", 1.0),  # the tie at m
        ("a", "b", 2.0),
        ("b", "a", 2.0),
        ("c", "d", 1.0),
        ("d", "c", 1.0),
        ("m", "c", 0.5),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    base = {
        r.node: r.label for r in G.label_propagation(df, max_iter=3).collect()
    }
    assert base["m"] == "a"  # the tie resolved to the smaller label
    monkeypatch.setattr(G, "_ENCODE_MIN_EDGES", 1)
    enc = {
        r.node: r.label for r in G.label_propagation(df, max_iter=3).collect()
    }
    assert enc == base


def test_word_graph_encode_matches_string(spark, sf_dir, monkeypatch):
    """The vocab-encoded word-graph build (ints through the pair join,
    aggregate, normalization, loop) must be row-identical to the string
    build for every consumer shape: ranked floats (pagerank_top20),
    integer structure (word_triangle_counts), and an encoded ROOT plus
    hop labels (word_graph_bfs)."""
    for name in (
        "pagerank_top20",
        "word_triangle_counts",
        "word_graph_bfs",
        "word_graph_sssp",
    ):
        spark.catalog.clearCache()
        base = sorted(map(tuple, Q.QUERIES[name](spark, sf_dir).collect()))
        monkeypatch.setattr(Q, "_GRAPH_ENCODE_MIN_BYTES", 0)
        spark.catalog.clearCache()
        enc = sorted(map(tuple, Q.QUERIES[name](spark, sf_dir).collect()))
        monkeypatch.undo()
        assert enc == base, name


def test_chunk_dedup_split_shape_matches_window_shape(spark, monkeypatch):
    """chunk_dedup's keys-not-payload shape (decision pass on fingerprints,
    text re-attached once) ≡ the single-pass window shape, covering: cross-
    doc duplicate chunks, a fully-deduplicated doc (text_kept=''), a
    trailing partial chunk, and an empty doc (absent from both outputs)."""
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee"),  # chunks: 'aa bb', 'cc dd', 'ee'
            (2, "aa bb xx yy"),  # 'aa bb' dups doc 1
            (3, "aa bb cc dd"),  # fully duplicated -> ''
            (4, ""),  # no chunks -> absent
            (5, "zz"),
        ],
        "doc_id long, text string",
    )
    base = sorted(
        map(tuple, C.chunk_dedup(docs, words_per_chunk=2).collect())
    )
    assert (3, "", 2, 0) in base and all(r[0] != 4 for r in base)
    monkeypatch.setattr(C, "_SPLIT_SHUFFLE_MIN_BYTES", 0)
    split = sorted(
        map(tuple, C.chunk_dedup(docs, words_per_chunk=2).collect())
    )
    assert split == base


def test_est_scan_partitions_small_scan_is_one(spark, sf_dir):
    """The stats-based split estimate that replaced rdd.getNumPartitions()
    on the fan-out gates: a sub-MB parquet scan estimates one split."""
    from mapreduce_big_data_processing_spark.operators.similarity import (
        _est_scan_partitions,
    )
    from mapreduce_big_data_processing_spark import catalog

    df = catalog.load(spark, "embeddings", sf_dir).select("embedding")
    assert _est_scan_partitions(df) == 1
