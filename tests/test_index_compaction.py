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

from pyspark.sql import functions as F

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
    # epochs 0 and 1 folded into compaction generation 1 (sig_epoch=-1);
    # epoch 2 untouched — and the manifest records exactly that
    slices = sorted(e for e in os.listdir(idx_dir) if e.startswith("sig_epoch="))
    assert slices == ["sig_epoch=-1", "sig_epoch=2"]
    from mapreduce_big_data_processing_spark.streaming.sinks import (
        read_index_manifest,
    )

    mf = read_index_manifest(idx_dir)
    assert mf["epochs"] == [-1, 2] and mf["gen"] == 1


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


def _copy_slice(spark, tmp_path, idx_dir, src_epoch, dst_epoch):
    """Fabricate a torn slice: copy src_epoch's parquet files into a
    sig_epoch=dst_epoch directory WITHOUT touching the manifest — exactly
    the on-disk state a crash between a parquet write and the manifest
    commit leaves behind."""
    import shutil

    dup = (
        spark.read.schema(_SIG_SCHEMA)
        .parquet(idx_dir)
        .filter(f"sig_epoch = {src_epoch}")
        .drop("sig_epoch")
        .localCheckpoint(eager=True)
    )
    tmp = str(tmp_path / f"dup_slice_{dst_epoch}")
    dup.write.mode("overwrite").parquet(tmp)
    os.makedirs(os.path.join(idx_dir, f"sig_epoch={dst_epoch}"), exist_ok=True)
    for p in os.listdir(tmp):
        if p.endswith(".parquet"):
            shutil.copyfile(
                os.path.join(tmp, p),
                os.path.join(idx_dir, f"sig_epoch={dst_epoch}", p),
            )


def test_torn_compaction_is_invisible_without_recovery(spark, tmp_path):
    """A compaction that crashes BEFORE its manifest commit leaves an
    orphan target slice duplicating history rows — which the MINHASH
    fold would not tolerate if it could see them (band signatures
    string_agg the per-doc rows, so a duplicated doc gets a different
    band key and silently stops matching; measured before the manifest
    protocol existed). Manifest-gated reads make the orphan invisible:
    the next batch's decisions match the never-crashed run with NO
    recovery action, and a later compaction garbage-collects the orphan
    (its retry overwrites the same generation partition)."""
    from mapreduce_big_data_processing_spark.streaming.sinks import (
        read_index_manifest,
    )

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
    # torn compaction: gen-1 target (sig_epoch=-1) written, manifest not
    # flipped — epoch-0 rows now exist on disk in TWO directories
    _copy_slice(spark, tmp_path, idx_dir, 0, -1)
    # no recovery, straight to the next batch: decisions unchanged
    assert decide_b1() == clean
    # the compaction retry overwrites the orphan generation and commits;
    # afterwards only manifest-listed slices remain on disk
    assert compact_ingest_index(spark, idx_dir, 1, _SIG_SCHEMA) == 0  # one src
    assert decide_b1() == clean  # still gated correctly
    _near_dup_apply_batch(
        spark.createDataFrame(
            [(d, t) for d, t in _DOCS if d >= 20], "doc_id bigint, text string"
        ),
        2,
        **kw,
    )
    assert compact_ingest_index(spark, idx_dir, 2, _SIG_SCHEMA) == 2
    mf = read_index_manifest(idx_dir)
    listed = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(idx_dir)
        if e.startswith("sig_epoch=")
    )
    assert listed == mf["epochs"] == [-1, 2]


def test_torn_source_removal_is_invisible_and_swept(spark, tmp_path):
    """The other crash window: manifest committed, source-slice removal
    not finished. The leftover source is unlisted, so reads ignore it;
    the NEXT compaction sweeps it."""
    idx_dir, dec_dir = str(tmp_path / "idx"), str(tmp_path / "dec")
    kw = dict(idx_dir=idx_dir, dec_dir=dec_dir, n_hashes=16, bands=4,
              min_est_jaccard=0.5)
    for ep in range(2):
        batch = [(d, t) for d, t in _DOCS if d // 10 == ep]
        _near_dup_apply_batch(
            spark.createDataFrame(batch, "doc_id bigint, text string"),
            ep,
            **kw,
        )
    assert compact_ingest_index(spark, idx_dir, 2, _SIG_SCHEMA) == 2
    # resurrect a folded source dir, as if rmtree never ran
    _copy_slice(spark, tmp_path, idx_dir, -1, 0)

    def decide_b2():
        _near_dup_apply_batch(
            spark.createDataFrame(
                [(d, t) for d, t in _DOCS if d >= 20],
                "doc_id bigint, text string",
            ),
            2,
            **kw,
        )
        return sorted(
            (r.doc_id, r.status, r.matched_id, r.est_jaccard)
            for r in spark.read.parquet(dec_dir).collect()
            if r.ingest_epoch == 2
        )

    clean = decide_b2()
    assert clean  # non-vacuous: batch 2 really classified against history

    def committed_rows():
        from mapreduce_big_data_processing_spark.streaming.sinks import (
            read_index_manifest,
        )

        eps = read_index_manifest(idx_dir)["epochs"]
        return sorted(
            (r.doc_id, r.h, r.minhash)
            for r in spark.read.schema(_SIG_SCHEMA)
            .parquet(idx_dir)
            .filter(F.col("sig_epoch").isin(eps))
            .collect()
        )

    before = committed_rows()
    # sweep: compacting {-1, 2} at watermark 3 folds them AND removes the
    # unlisted sig_epoch=0 leftover; the committed row MULTISET is
    # untouched (no dedup anywhere in the protocol)
    assert compact_ingest_index(spark, idx_dir, 3, _SIG_SCHEMA) == 2
    slices = sorted(e for e in os.listdir(idx_dir) if e.startswith("sig_epoch="))
    assert slices == ["sig_epoch=-2"]
    assert committed_rows() == before
