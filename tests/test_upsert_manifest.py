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


# ---------------------------------------------------------------------------
# retain_history mode: snapshot ledger, time travel, retention GC
# ---------------------------------------------------------------------------

from mapreduce_big_data_processing_spark.streaming.sinks import (  # noqa: E402
    _gc_snapshots,
    _snapshot_name,
    commit_history_manifest,
    read_keyed_table,
)


def _seed_history(spark, work_dir, retain=3):
    base = spark.createDataFrame(
        [(1, 1, "a", "put"), (2, 1, "b", "put")], _SCHEMA
    )
    seed = _snapshot_name(-1)
    base.write.mode("overwrite").parquet(os.path.join(work_dir, seed))
    commit_history_manifest(work_dir, [[-1, seed]], -1, retain)


def _hkw(work_dir, spark, retain=3):
    kw = _kw(work_dir, gens=None, spark=spark)
    kw["retain_history"] = retain
    return kw


def _live(spark, work_dir, as_of=None):
    df = read_keyed_table(spark, work_dir, _SCHEMA, as_of_batch=as_of)
    return sorted((r.k, r.version, r.v) for r in df.collect())


def _apply_three(spark, wd, kw):
    batches = [
        spark.createDataFrame(
            [(1, 2, "a2", "put"), (3, 1, "c", "put")], _SCHEMA
        ),
        spark.createDataFrame([(2, 2, None, "delete")], _SCHEMA),
        spark.createDataFrame([(2, 3, "b3", "put")], _SCHEMA),
    ]
    for i, b in enumerate(batches):
        _keyed_upsert_apply_batch(b, i, **kw)


def test_time_travel_reads_each_retained_snapshot(spark, tmp_path):
    wd = str(tmp_path)
    _seed_history(spark, wd)
    _apply_three(spark, wd, _hkw(wd, spark))
    # as-of each retained batch: the state the table had THEN, immutably
    assert _live(spark, wd, as_of=0) == [
        (1, 2, "a2"), (2, 1, "b"), (3, 1, "c")
    ]
    assert _live(spark, wd, as_of=1) == [(1, 2, "a2"), (3, 1, "c")]
    assert _live(spark, wd, as_of=2) == [
        (1, 2, "a2"), (2, 3, "b3"), (3, 1, "c")
    ]
    # as_of between commits resolves DOWN to the newest batch <= asked
    assert _live(spark, wd, as_of=7) == _live(spark, wd, as_of=2)
    # default read = current state
    assert _live(spark, wd) == _live(spark, wd, as_of=2)


def test_retention_gc_enforces_vacuum_horizon(spark, tmp_path):
    wd = str(tmp_path)
    _seed_history(spark, wd)
    _apply_three(spark, wd, _hkw(wd, spark))
    mf = read_upsert_manifest(wd)
    assert [b for b, _ in mf["history"]] == [0, 1, 2]  # seed rotated out
    assert not os.path.exists(os.path.join(wd, _snapshot_name(-1)))
    with pytest.raises(ValueError, match="predates the retention window"):
        _live(spark, wd, as_of=-1)


def test_torn_snapshot_invisible_and_swept(spark, tmp_path):
    """Crash window: a snapshot directory written but never committed is
    invisible to every reader (the ledger does not list it) and the next
    successful commit's GC sweeps it — same protocol as the ingest-index
    compaction."""
    wd = str(tmp_path)
    _seed_history(spark, wd)
    kw = _hkw(wd, spark)
    # torn write of batch 0's snapshot (crash before the manifest commit)
    torn = os.path.join(wd, _snapshot_name(0))
    os.makedirs(torn, exist_ok=True)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not a parquet footer")
    # reader protocol: only the committed seed is visible
    assert _live(spark, wd) == [(1, 1, "a"), (2, 1, "b")]
    # the retry overwrites the torn directory and commits cleanly
    b0 = spark.createDataFrame([(3, 1, "c", "put")], _SCHEMA)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    assert _live(spark, wd) == [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")]
    # an unrelated orphan from some earlier torn attempt is swept by the
    # commit-then-GC order as well
    orphan = os.path.join(wd, "snap_77")
    os.makedirs(orphan, exist_ok=True)
    b1 = spark.createDataFrame([(4, 1, "d", "put")], _SCHEMA)
    _keyed_upsert_apply_batch(b1, 1, **kw)
    assert not os.path.exists(orphan)


def test_redelivered_batch_skipped_in_history_mode(spark, tmp_path):
    wd = str(tmp_path)
    _seed_history(spark, wd)
    kw = _hkw(wd, spark)
    b0 = spark.createDataFrame([(1, 2, "a2", "put")], _SCHEMA)
    _keyed_upsert_apply_batch(b0, 0, **kw)
    mf_first = read_upsert_manifest(wd)
    state_first = _live(spark, wd)
    _keyed_upsert_apply_batch(b0, 0, **kw)  # checkpoint-recovery replay
    assert read_upsert_manifest(wd) == mf_first
    assert _live(spark, wd) == state_first


def test_ab_mode_rejects_time_travel(spark, tmp_path):
    wd = str(tmp_path)
    _seed(spark, wd)
    # current state reads fine through the same entry point…
    assert _live(spark, wd) == [(1, 1, "a"), (2, 1, "b")]
    # …but as-of needs the ledger
    with pytest.raises(ValueError, match="retain_history"):
        read_keyed_table(spark, wd, _SCHEMA, as_of_batch=0)


def test_keyed_table_changes_tags_insert_update_delete(spark, tmp_path):
    """CDF between retained snapshots: seed→b0 shows an update (key 1
    re-put at higher version) + an insert (new key 3); b0→b1 shows the
    delete tombstone; b0→b2 shows only key 2's final re-put (the delete
    that batch 1 applied is SUPERSEDED — idempotent consumers see one
    net change per key, not the intermediate states)."""
    from mapreduce_big_data_processing_spark.streaming.sinks import (
        keyed_table_changes,
    )

    wd = str(tmp_path)
    _seed_history(spark, wd, retain=5)  # keep the seed in the window
    _apply_three(spark, wd, _hkw(wd, spark, retain=5))

    def changes(a, b):
        df = keyed_table_changes(spark, wd, _SCHEMA, ["k"], a, b)
        return sorted(
            (r.k, r.version, r.v, r.change_type) for r in df.collect()
        )

    assert changes(-1, 0) == [
        (1, 2, "a2", "update_postimage"),
        (3, 1, "c", "insert"),
    ]
    assert changes(0, 1) == [(2, 2, None, "delete")]
    assert changes(0, 2) == [(2, 3, "b3", "update_postimage")]
    # identical snapshots -> empty feed (no-op re-puts invisible)
    assert changes(2, 2) == []


def test_time_travel_schema_evolution_reads_missing_column_as_null(
    spark, tmp_path
):
    """Schema-evolution contract of the snapshot ledger: reading an OLD
    snapshot with a WIDER current schema yields NULL for the added
    column (parquet read with explicit schema) — the add-column path a
    table format gives, reduced to plain parquet."""
    wd = str(tmp_path)
    _seed_history(spark, wd)
    _apply_three(spark, wd, _hkw(wd, spark))
    wide = "k bigint, version bigint, v string, extra double, op string"
    df = read_keyed_table(spark, wd, wide, as_of_batch=0)
    rows = sorted((r.k, r.version, r.v, r.extra) for r in df.collect())
    assert rows == [
        (1, 2, "a2", None), (2, 1, "b", None), (3, 1, "c", None)
    ]


def test_changes_rejects_reversed_window(spark, tmp_path):
    from mapreduce_big_data_processing_spark.streaming.sinks import (
        keyed_table_changes,
    )

    wd = str(tmp_path)
    _seed_history(spark, wd, retain=5)
    _apply_three(spark, wd, _hkw(wd, spark, retain=5))
    with pytest.raises(ValueError, match="run forward"):
        keyed_table_changes(spark, wd, _SCHEMA, ["k"], 2, 0)


def test_mode_mismatch_raises_informatively(spark, tmp_path):
    """A retain_history batch against an A/B manifest (and vice versa)
    must fail with the layout-mismatch explanation, not a KeyError."""
    wd = str(tmp_path)
    gens = _seed(spark, wd)  # A/B-mode seed
    b0 = spark.createDataFrame([(1, 2, "a2", "put")], _SCHEMA)
    kw = _kw(wd, gens, spark)
    kw["retain_history"] = 3
    with pytest.raises(ValueError, match="no snapshot ledger"):
        _keyed_upsert_apply_batch(b0, 0, **kw)

    wd2 = str(tmp_path / "hist")
    os.makedirs(wd2)
    _seed_history(spark, wd2)
    kw2 = _kw(wd2, gens, spark)  # retain_history defaults to 0
    with pytest.raises(ValueError, match="generation pointer"):
        _keyed_upsert_apply_batch(b0, 0, **kw2)
