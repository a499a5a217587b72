"""keyed_upsert (S10 write half): HBase Put/Delete as a join-based MERGE.

Reference semantics (`ppt/Ch6-HBase与Hive程序设计.pdf p.23-38`): latest
version wins, a delete masks a put at the same timestamp, a mutation
beats the stored row on ties (seqid), and re-applying a batch is a no-op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.sources.writers import keyed_upsert

BASE_SCHEMA = "k long, version long, val string"
MUT_SCHEMA = "k long, version long, val string, op string"


def _state(df):
    return {(r.k): (r.version, r.val) for r in df.collect()}


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c"), (4, 10, "d"), (5, 10, "e")],
        BASE_SCHEMA,
    )


def test_upsert_update_delete_insert_stale(spark, base):
    muts = spark.createDataFrame(
        [
            (1, 11, "A", "put"),      # newer put: applies
            (2, 11, None, "delete"),  # newer delete: row gone
            (6, 11, "f", "put"),      # new key: insert
            (3, 9, "zz", "put"),      # STALE put: stored row stays
            (4, 9, None, "delete"),   # STALE delete: stored row stays
        ],
        MUT_SCHEMA,
    )
    got = _state(keyed_upsert(base, muts, ["k"], "version"))
    assert got == {
        1: (11, "A"),
        3: (10, "c"),
        4: (10, "d"),
        5: (10, "e"),
        6: (11, "f"),
    }


def test_upsert_equal_version_delete_masks_put(spark, base):
    # same key, same version, put+delete in one batch → delete wins;
    # and a delete at exactly the stored version masks the stored row
    muts = spark.createDataFrame(
        [(1, 12, "A", "put"), (1, 12, None, "delete"), (2, 10, None, "delete")],
        MUT_SCHEMA,
    )
    got = _state(keyed_upsert(base, muts, ["k"], "version"))
    assert 1 not in got and 2 not in got
    assert got[3] == (10, "c")


def test_upsert_equal_version_mutation_beats_base(spark, base):
    # put at exactly the stored version: the mutation (higher seqid) wins
    muts = spark.createDataFrame([(3, 10, "C2", "put")], MUT_SCHEMA)
    got = _state(keyed_upsert(base, muts, ["k"], "version"))
    assert got[3] == (10, "C2")


def test_upsert_latest_mutation_in_batch_wins(spark, base):
    muts = spark.createDataFrame(
        [(1, 11, "v11", "put"), (1, 13, "v13", "put"), (1, 12, None, "delete")],
        MUT_SCHEMA,
    )
    got = _state(keyed_upsert(base, muts, ["k"], "version"))
    assert got[1] == (13, "v13")


def test_upsert_reapply_is_idempotent(spark, base):
    muts = spark.createDataFrame(
        [
            (1, 11, "A", "put"),
            (2, 11, None, "delete"),
            (6, 11, "f", "put"),
            (3, 9, "zz", "put"),
        ],
        MUT_SCHEMA,
    )
    once = keyed_upsert(base, muts, ["k"], "version")
    twice = keyed_upsert(once, muts, ["k"], "version")
    assert _state(once) == _state(twice)


def test_upsert_missing_columns_raises(spark, base):
    bad = spark.createDataFrame([(1, 11, "put")], "k long, version long, op string")
    with pytest.raises(ValueError, match="missing columns"):
        keyed_upsert(base, bad, ["k"], "version")


def test_upsert_untouched_rows_avoid_exchange(spark, base):
    """The base side passes through broadcast anti/semi joins — no
    hash-partition exchange of the (100 TB) base in the plan."""
    muts = spark.createDataFrame([(1, 11, "A", "put")], MUT_SCHEMA)
    plan = (
        keyed_upsert(base, muts, ["k"], "version")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan
    # the merge window shuffles only the touched/mutation rows; the
    # untouched branch must not be hash-repartitioned
    anti_branch = plan.split("LeftAnti")[0]
    assert "Exchange hashpartitioning" not in anti_branch
