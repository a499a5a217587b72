"""Epoch compaction of the ingest signature indexes.

A 100 TB/day fold accumulates one ``sig_epoch=N`` partition per
micro-batch; `compact_ingest_index` folds all slices below a watermark
into one. The load-bearing property: the readable history SET for every
batch at or above the watermark is unchanged, so the fold's decisions
are identical with and without compaction — proved here for both the
minhash and the embedding sinks by running the same epoch sequence twice
and diffing the decision tables row-for-row.
"""

from __future__ import annotations

import os

from mapreduce_big_data_processing_spark.operators.similarity import (
    seeded_planes,
)
from mapreduce_big_data_processing_spark.streaming.sinks import (
    _embedding_near_dup_apply_batch,
    _near_dup_apply_batch,
    compact_ingest_index,
)

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again today"),
    (2, "completely different text about spark dataframe engines entirely here"),
    (10, "the quick brown fox jumps over the lazy dog again today"),
    (11, "unique text nothing like anything else in this corpus at all"),
    (20, "the quick brown fox jumps over the lazy dog again today"),
    (21, "completely different text about spark dataframe engines entirely here"),
]

_SIG_SCHEMA = "doc_id bigint, h int, minhash bigint, sig_epoch int"
_EMB_SCHEMA = "vec_id bigint, embedding array<float>, bucket bigint, sig_epoch int"


def _minhash_run(spark, wd, compact_after=None):
    idx_dir, dec_dir = str(wd / "idx"), str(wd / "dec")
    kw = dict(idx_dir=idx_dir, dec_dir=dec_dir, n_hashes=16, bands=4,
              min_est_jaccard=0.5)
    for ep in range(3):
        batch = [(d, t) for d, t in _DOCS if d // 10 == ep]
        bdf = spark.createDataFrame(batch, "doc_id bigint, text string")
        _near_dup_apply_batch(bdf, ep, **kw)
        if compact_after is not None and ep == compact_after:
            n = compact_ingest_index(spark, idx_dir, ep + 1, _SIG_SCHEMA)
            assert n > 0  # something actually compacted
    return sorted(
        (r.doc_id, r.ingest_epoch, r.status, r.matched_id, r.est_jaccard)
        for r in spark.read.parquet(dec_dir).collect()
    ), idx_dir


def test_minhash_fold_unchanged_by_compaction(spark, tmp_path):
    plain, _ = _minhash_run(spark, tmp_path / "plain")
    compacted, idx_dir = _minhash_run(spark, tmp_path / "comp", compact_after=1)
    assert compacted == plain
    # epochs 0 and 1 folded into one slice; epoch 2 untouched
    slices = sorted(e for e in os.listdir(idx_dir) if e.startswith("sig_epoch="))
    assert slices == ["sig_epoch=1", "sig_epoch=2"]


def _emb_run(spark, wd, compact_after=None):
    idx_dir, dec_dir = str(wd / "idx"), str(wd / "dec")
    kw = dict(idx_dir=idx_dir, dec_dir=dec_dir,
              planes=seeded_planes(4, dim=4, seed=7), threshold=0.9)
    vecs = {
        0: [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        1: [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])],
        2: [(20, [1.0, 0.0, 0.0, 0.0]), (21, [0.0, 1.0, 0.0, 0.0])],
    }
    for ep in range(3):
        bdf = spark.createDataFrame(
            vecs[ep], "vec_id bigint, embedding array<float>"
        )
        _embedding_near_dup_apply_batch(bdf, ep, **kw)
        if compact_after is not None and ep == compact_after:
            compact_ingest_index(spark, idx_dir, ep + 1, _EMB_SCHEMA)
    return sorted(
        (r.vec_id, r.ingest_epoch, r.status, r.matched_id, r.cosine)
        for r in spark.read.parquet(dec_dir).collect()
    )


def test_embedding_fold_unchanged_by_compaction(spark, tmp_path):
    assert _emb_run(spark, tmp_path / "comp", compact_after=1) == _emb_run(
        spark, tmp_path / "plain"
    )


def test_compaction_noops_below_two_slices(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    assert compact_ingest_index(spark, idx_dir, 5, _SIG_SCHEMA) == 0  # missing
    os.makedirs(os.path.join(idx_dir, "sig_epoch=0"))
    assert compact_ingest_index(spark, idx_dir, 5, _SIG_SCHEMA) == 0  # single


def test_compaction_rerun_heals_crash_duplicates(spark, tmp_path):
    """Crash between the compacted write and slice removal leaves history
    rows duplicated across slices — which the MINHASH fold does NOT
    tolerate (band signatures string_agg the per-doc rows, so a
    duplicated doc gets a different band key and silently stops
    matching; this test MEASURED that before the recovery rule existed).
    The documented protocol: re-run compaction before the next batch.
    The re-run deduplicates exact rows, so decisions after recovery
    match the never-crashed run."""
    import shutil

    idx_dir, dec_dir = str(tmp_path / "idx"), str(tmp_path / "dec")
    kw = dict(idx_dir=idx_dir, dec_dir=dec_dir, n_hashes=16, bands=4,
              min_est_jaccard=0.5)
    b0 = spark.createDataFrame(
        [(d, t) for d, t in _DOCS if d < 10], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [(d, t) for d, t in _DOCS if 10 <= d < 20], "doc_id bigint, text string"
    )
    _near_dup_apply_batch(b0, 0, **kw)

    def decide_b1():
        _near_dup_apply_batch(b1, 1, **kw)
        return sorted(
            (r.doc_id, r.status, r.matched_id, r.est_jaccard)
            for r in spark.read.parquet(dec_dir).collect()
            if r.ingest_epoch == 1
        )

    clean = decide_b1()
    # simulate the crash window: epoch-0 rows exist BOTH in their original
    # slice and as a compacted copy under a second epoch still < 1
    dup = (
        spark.read.schema(_SIG_SCHEMA)
        .parquet(idx_dir)
        .filter("sig_epoch = 0")
        .drop("sig_epoch")
        .localCheckpoint(eager=True)
    )
    tmp = str(tmp_path / "dup_slice")
    dup.write.mode("overwrite").parquet(tmp)
    os.makedirs(os.path.join(idx_dir, "sig_epoch=-1"), exist_ok=True)
    for p in os.listdir(tmp):
        if p.endswith(".parquet"):
            shutil.copyfile(
                os.path.join(tmp, p),
                os.path.join(idx_dir, "sig_epoch=-1", p),
            )
    # recovery: re-run compaction (watermark 1 folds {-1, 0}), THEN the
    # next batch — decisions match the never-crashed run
    assert compact_ingest_index(spark, idx_dir, 1, _SIG_SCHEMA) > 0
    assert decide_b1() == clean
