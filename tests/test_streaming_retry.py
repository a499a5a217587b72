"""Retry idempotence of the near-dup ingest sink's per-batch fold.

A foreachBatch retry re-runs the SAME batch_id after a failure that may
already have written the batch's own ``sig_epoch = batch_id`` index
slice. The fold must classify the retried batch against history
STRICTLY BELOW its own epoch — otherwise every doc in the batch finds
its own signatures in "history" (16/16 agreement) and flips from
``kept`` to ``near_dup_of_history`` with ``matched_id = doc_id``,
producing different (wrong) values than a clean first run. Exercises
``streaming.sinks._near_dup_apply_batch`` directly (the closure the
streaming query drives), per the r7 ADVICE finding.
"""

from __future__ import annotations

from mapreduce_big_data_processing_spark.streaming.sinks import (
    _near_dup_apply_batch,
)

_DOC_A = "the quick brown fox jumps over the lazy dog again today"
_DOC_B = "completely different text about spark dataframe engines entirely here"
_DOC_C = "unique text nothing like anything else in this corpus at all"


def _decisions(spark, dec_dir):
    rows = spark.read.parquet(dec_dir).collect()
    return sorted(
        (r["doc_id"], r["ingest_epoch"], r["status"], r["matched_id"], r["est_jaccard"])
        for r in rows
    )


def test_near_dup_batch_retry_is_idempotent(spark, tmp_path):
    idx_dir = str(tmp_path / "sig_index")
    dec_dir = str(tmp_path / "decisions")
    kw = dict(
        idx_dir=idx_dir,
        dec_dir=dec_dir,
        n_hashes=16,
        bands=4,
        min_est_jaccard=0.5,
    )
    b0 = spark.createDataFrame(
        [(1, _DOC_A), (2, _DOC_B)], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [(10, _DOC_A), (11, _DOC_C)], "doc_id bigint, text string"
    )
    _near_dup_apply_batch(b0, 0, **kw)
    _near_dup_apply_batch(b1, 1, **kw)
    clean = _decisions(spark, dec_dir)
    # sanity: the exact-copy doc dedups against history, the unique keeps
    by_id = {d[0]: d for d in clean}
    assert by_id[10][2] == "near_dup_of_history" and by_id[10][3] == 1
    assert by_id[11][2] == "kept"

    # retry batch 1: its own sig_epoch=1 index slice already exists (the
    # failed-attempt shape). The fold must not see it as history.
    _near_dup_apply_batch(b1, 1, **kw)
    assert _decisions(spark, dec_dir) == clean


def test_near_dup_batch_0_retry_with_own_slice(spark, tmp_path):
    """Even the FIRST batch retries idempotently: its own epoch-0 slice
    is the only index content, and the epoch filter must reduce history
    to empty rather than matching every doc against itself."""
    idx_dir = str(tmp_path / "sig_index")
    dec_dir = str(tmp_path / "decisions")
    kw = dict(
        idx_dir=idx_dir,
        dec_dir=dec_dir,
        n_hashes=16,
        bands=4,
        min_est_jaccard=0.5,
    )
    b0 = spark.createDataFrame(
        [(1, _DOC_A), (2, _DOC_B)], "doc_id bigint, text string"
    )
    _near_dup_apply_batch(b0, 0, **kw)
    clean = _decisions(spark, dec_dir)
    assert all(d[2] == "kept" for d in clean)
    _near_dup_apply_batch(b0, 0, **kw)
    assert _decisions(spark, dec_dir) == clean


def test_embedding_batch_retry_is_idempotent(spark, tmp_path):
    """The embedding twin of the minhash retry contract: a retried
    batch_id whose own sig_epoch index slice already exists must not see
    itself as history (every vector would flip to near_dup_of_history
    with matched_id = vec_id at cosine 1.0)."""
    from mapreduce_big_data_processing_spark.operators.similarity import (
        seeded_planes,
    )
    from mapreduce_big_data_processing_spark.streaming.sinks import (
        _embedding_near_dup_apply_batch,
    )

    idx_dir = str(tmp_path / "emb_index")
    dec_dir = str(tmp_path / "emb_decisions")
    kw = dict(
        idx_dir=idx_dir,
        dec_dir=dec_dir,
        planes=seeded_planes(4, dim=4, seed=7),
        threshold=0.9,
    )
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    b0 = spark.createDataFrame(
        [(1, v), (2, w)], "vec_id bigint, embedding array<float>"
    )
    b1 = spark.createDataFrame(
        [(10, v), (11, [0.0, 0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    _embedding_near_dup_apply_batch(b0, 0, **kw)
    _embedding_near_dup_apply_batch(b1, 1, **kw)

    def decisions():
        return sorted(
            (r.vec_id, r.ingest_epoch, r.status, r.matched_id, r.cosine)
            for r in spark.read.parquet(dec_dir).collect()
        )

    clean = decisions()
    by_id = {d[0]: d for d in clean}
    assert by_id[10][2] == "near_dup_of_history" and by_id[10][3] == 1
    assert by_id[11][2] == "kept" and by_id[11][3] == -1

    # retry batch 1 with its own sig_epoch=1 slice already written
    _embedding_near_dup_apply_batch(b1, 1, **kw)
    assert decisions() == clean
