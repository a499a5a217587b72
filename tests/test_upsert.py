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


# ---------------------------------------------------------------------------
# keep_tombstones: the continuous-ingest contract (streaming/sinks.py)
# ---------------------------------------------------------------------------

TOMB_SCHEMA = "k long, version long, val string, op string"


def _live(df):
    return {
        r.k: (r.version, r.val)
        for r in df.filter(F.col("op") == "put").collect()
    }


@pytest.mark.slow
def test_tombstones_commute_across_batch_orders(spark):
    """The bug the streaming sink found: without stored tombstones, a
    reordered batch holding an OLDER put for a deleted key resurrects
    it. With keep_tombstones=True, every interleaving of the batches
    converges to the same state."""
    import itertools

    empty = spark.createDataFrame([], TOMB_SCHEMA)
    batches = [
        [(1, 10, "a", "put"), (2, 10, "b", "put")],
        [(1, 20, None, "delete"), (3, 21, "c", "put")],
        [(1, 15, "stale", "put"), (2, 22, "B", "put")],  # older put for deleted k=1
    ]
    want = {2: (22, "B"), 3: (21, "c")}  # k=1 stays dead in every order
    for perm in itertools.permutations(range(3)):
        state = empty
        for bi in perm:
            muts = spark.createDataFrame(batches[bi], TOMB_SCHEMA)
            state = keyed_upsert(
                state, muts, ["k"], "version", keep_tombstones=True
            )
        assert _live(state) == want, f"order {perm} diverged"


def test_tombstones_idempotent_reapply(spark):
    empty = spark.createDataFrame([], TOMB_SCHEMA)
    muts = spark.createDataFrame(
        [(1, 10, "a", "put"), (2, 11, None, "delete"), (2, 9, "b", "put")],
        TOMB_SCHEMA,
    )
    s1 = keyed_upsert(empty, muts, ["k"], "version", keep_tombstones=True)
    s2 = keyed_upsert(s1, muts, ["k"], "version", keep_tombstones=True)
    rows1 = sorted(map(tuple, s1.collect()))
    rows2 = sorted(map(tuple, s2.collect()))
    assert rows1 == rows2
    # the tombstone itself is persisted (k=2 present as a delete marker)
    assert {r.k: r.op for r in s1.collect()} == {1: "put", 2: "delete"}


def test_tombstones_require_op_in_base(spark):
    base = spark.createDataFrame([], "k long, version long, val string")
    muts = spark.createDataFrame([(1, 1, "a", "put")], TOMB_SCHEMA)
    with pytest.raises(ValueError, match="base must carry"):
        keyed_upsert(base, muts, ["k"], "version", keep_tombstones=True)
