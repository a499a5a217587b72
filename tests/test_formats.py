"""Format-contract tests (SURVEY §5.3) + CJK segmentation golden test."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark.operators import logreport as LR
from mapreduce_big_data_processing_spark.operators import text as TX
from mapreduce_big_data_processing_spark.sources import writers as WR


def test_hourly_report_line_format(spark):
    df = spark.createDataFrame(
        [("2015-09-08 10:00:01", "200"), ("2015-09-08 10:30:00", "200"),
         ("2015-09-08 10:59:59", "404"), ("2015-09-08 11:00:00", "200")],
        "t string, status string",
    ).select(F.col("t").cast("timestamp").alias("ts"), "status")
    out = {
        (r.window_range, r.line)
        for r in LR.hourly_report_lines(df, key="status").collect()
    }
    assert ("2015-09-08 10:00-11:00", "200:2") in out
    assert ("2015-09-08 10:00-11:00", "404:1") in out
    assert ("2015-09-08 11:00-12:00", "200:1") in out


def test_per_key_file_naming(spark, tmp_path):
    """per-URL file naming: `/tour/category/query` → tour-category-query.txt
    (`…课程设计1….pdf p.2` task 3), one directory per key via partitionBy."""
    df = spark.createDataFrame(
        [("/tour/category/query", 1), ("/index", 2), ("172.22.49.26", 3)],
        "url string, v int",
    )
    named = LR.per_key_file_column(df, "url")
    keys = {r.file_key for r in named.collect()}
    assert keys == {"tour-category-query.txt", "index.txt", "172.22.49.26.txt"}
    out = os.path.join(str(tmp_path), "by_key")
    WR.write_partitioned(named, out, ["file_key"], fmt="csv")
    dirs = {d for d in os.listdir(out) if d.startswith("file_key=")}
    assert "file_key=tour-category-query.txt" in dirs
    assert "file_key=172.22.49.26.txt" in dirs


def test_cjk_dictionary_segmentation(spark):
    """P3 CJK — dictionary maximal matching on the project-2 names
    (`…课程设计2….pdf p.2`: extract character names per paragraph)."""
    names = ["狄云", "戚芳", "戚长发", "卜垣"]
    docs = spark.createDataFrame(
        [
            (1, "狄云和戚芳在万家"),
            (2, "戚芳戚长发卜垣都来了"),
            (3, "no cjk here at all"),
        ],
        "doc_id long, text string",
    )
    toks = TX.tokenize_cjk(docs, dictionary=names, keep_cols=["doc_id"])
    got = {(r.doc_id, r.word) for r in toks.collect()}
    # longest match wins: 戚长发 is not split into 戚/长/发
    assert (2, "戚长发") in got
    assert (2, "戚芳") in got and (2, "卜垣") in got
    assert (1, "狄云") in got and (1, "戚芳") in got
    # non-dictionary CJK dropped; ascii falls back to standard tokens
    assert (3, "no") in got and (3, "cjk") in got
    assert not any(w == "万家" for _, w in got)


def test_cjk_pipeline_to_cooccurrence(spark):
    """End-to-end: CJK segmentation → co-occurrence pairs (the project-2
    flow) matches the spec's worked pair counts."""
    names = ["狄云", "戚芳", "戚长发", "卜垣"]
    paras = spark.createDataFrame(
        [(1, "狄云见戚芳"), (2, "戚芳与戚长发和卜垣"), (3, "戚芳卜垣"), (4, "卜垣")],
        "para_id long, text string",
    )
    toks = TX.tokenize_cjk(paras, dictionary=names, keep_cols=["para_id"])
    pairs = TX.cooccurrence_pairs(toks, unit_col="para_id", symmetric=False)
    counts = {(r.w1, r.w2): r.cnt for r in pairs.collect()}
    assert counts.get(("卜垣", "戚芳")) == 2
    assert sum(counts.values()) == 5  # 1 + 3 + 1 pairs across paragraphs
