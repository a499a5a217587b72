"""Atomic-commit manifest for the keyed-upsert generation store.

The streaming upsert sink keeps state in two alternating parquet
generations; the COMMIT is an atomic rename of ``MANIFEST.json``
({generation, batch_id}) — the write-new/swap-pointer discipline a table
format's transaction log provides. These tests exercise the crash and
redelivery scenarios that in-memory pointer tracking could not survive:

- crash AFTER a generation write but BEFORE the manifest commit: the torn
  generation is invisible; the retried batch re-reads the committed input
  and overwrites the torn target, converging to the clean result
- redelivery of an already-committed batch_id (foreachBatch is
  at-least-once across checkpoint recovery): skipped outright, state
  untouched
"""

from __future__ import annotations

import os

import pytest

from mapreduce_big_data_processing_spark.streaming.sinks import (
    _keyed_upsert_apply_batch,
    commit_upsert_manifest,
    read_upsert_manifest,
)

_SCHEMA = "k bigint, version bigint, v string, op string"


def _seed(spark, work_dir):
    gens = [os.path.join(work_dir, "state_a"), os.path.join(work_dir, "state_b")]
    base = spark.createDataFrame(
        [(1, 1, "a", "put"), (2, 1, "b", "put")], _SCHEMA
    )
    base.write.mode("overwrite").parquet(gens[0])
    commit_upsert_manifest(work_dir, 0, -1)
    return gens


def _kw(work_dir, gens, spark):
    from pyspark.sql.types import StructType

    schema = spark.createDataFrame([], _SCHEMA).schema
    assert isinstance(schema, StructType)
    return dict(
        work_dir=work_dir,
        gens=gens,
        schema=schema,
        key_cols=["k"],
        version_col="version",
        op_col="op",
    )


def _state(spark, work_dir, gens):
    mf = read_upsert_manifest(work_dir)
    rows = spark.read.parquet(gens[mf["generation"]]).collect()
    return sorted((r.k, r.version, r.v, r.op) for r in rows)


def test_manifest_commit_is_rename_and_batch_advances(spark, tmp_path):
    wd = str(tmp_path)
    gens = _seed(spark, wd)
    kw = _kw(wd, gens, spark)
    b0 = spark.createDataFrame([(1, 2, "a2", "put"), (3, 1, "c", "put")], _SCHEMA)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    mf = read_upsert_manifest(wd)
    assert mf == {"generation": 1, "batch_id": 0}
    assert not os.path.exists(os.path.join(wd, "MANIFEST.json.tmp"))
    assert _state(spark, wd, gens) == [
        (1, 2, "a2", "put"),
        (2, 1, "b", "put"),
        (3, 1, "c", "put"),
    ]


def test_redelivered_batch_is_skipped(spark, tmp_path):
    wd = str(tmp_path)
    gens = _seed(spark, wd)
    kw = _kw(wd, gens, spark)
    b0 = spark.createDataFrame([(1, 2, "a2", "put")], _SCHEMA)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    after_first = _state(spark, wd, gens)
    mf_first = read_upsert_manifest(wd)
    # checkpoint-recovery redelivery: same id, possibly same content —
    # must be a no-op (no generation flip, no write)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    assert read_upsert_manifest(wd) == mf_first
    assert _state(spark, wd, gens) == after_first


def test_crash_before_commit_leaves_torn_generation_invisible(spark, tmp_path):
    """Simulate the crash window: generation N+1 written (torn: here,
    garbage bytes), manifest NOT advanced. A reader sees the committed
    generation only, and the batch retry overwrites the torn directory
    and converges to the clean result."""
    wd = str(tmp_path)
    gens = _seed(spark, wd)
    kw = _kw(wd, gens, spark)
    clean_before = _state(spark, wd, gens)

    # torn write of the NEXT generation (crash before commit): a stray
    # non-parquet file where the output directory would be
    os.makedirs(gens[1], exist_ok=True)
    with open(os.path.join(gens[1], "part-00000.parquet"), "wb") as fh:
        fh.write(b"not a parquet footer")

    # reader protocol: committed pointer still says generation 0
    assert read_upsert_manifest(wd)["generation"] == 0
    assert _state(spark, wd, gens) == clean_before

    # the retry (first delivery of batch 0 from the sink's view) reads
    # committed gen 0 and OVERWRITES the torn gen 1, then commits
    b0 = spark.createDataFrame([(2, 2, None, "delete")], _SCHEMA)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    assert read_upsert_manifest(wd) == {"generation": 1, "batch_id": 0}
    assert _state(spark, wd, gens) == [
        (1, 1, "a", "put"),
        (2, 2, None, "delete"),  # tombstone kept — the commutativity rule
    ]


def test_unseeded_state_dir_raises(spark, tmp_path):
    wd = str(tmp_path / "nowhere")
    os.makedirs(wd)
    gens = [os.path.join(wd, "state_a"), os.path.join(wd, "state_b")]
    kw = _kw(wd, gens, spark)
    b0 = spark.createDataFrame([(1, 2, "a2", "put")], _SCHEMA)
    with pytest.raises(RuntimeError, match="not seeded"):
        _keyed_upsert_apply_batch(b0, 0, **kw)
