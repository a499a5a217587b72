"""Physical-plan regression tests for the analytics queries.

Correctness is covered by the DuckDB oracle (test_oracle_parity); these
tests pin the SCALE properties — which joins broadcast, how many
exchanges a plan is allowed, whether a window reuses the aggregation
shuffle. A regression here is invisible at sf0.001 but is the difference
between one shuffle and two at 100 TB.
"""

from __future__ import annotations

from mapreduce_big_data_processing_spark import queries as Q


def _plan(spark, sf_dir, name: str) -> str:
    df = Q.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, token: str) -> int:
    return plan.count(token)


def test_pivot_broadcasts_dims_single_fact_pass(spark, sf_dir):
    """Pivot with explicit values: both dims broadcast (no shuffle of the
    fact for the joins) and no extra distinct-collect job for the pivot
    column values."""
    plan = _plan(spark, sf_dir, "segment_pivot_revenue")
    assert _count(plan, "BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # pivotfirst aggregate: values are compile-time literals, one pass
    assert "pivotfirst" in plan


def test_q17_correlated_subquery_one_fact_shuffle(spark, sf_dir):
    """The per-part average must come from a window over the brand-filtered
    rows: one hash exchange on l_partkey plus the final single-partition
    agg — never a second scan/shuffle of the full lineitem table."""
    plan = _plan(spark, sf_dir, "small_quantity_part_revenue")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_lag_delta_window_and_agg_share_exchange(spark, sf_dir):
    """Window(user_id) and groupBy(user_id) must reuse ONE exchange —
    Catalyst sees the window output is already partitioned on the group
    key. Two exchanges here doubles the shuffle volume of the query."""
    plan = _plan(spark, sf_dir, "user_value_deltas")
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_score_is_shuffle_free(spark, sf_dir):
    """Per-document repetition is a pure projection: no exchange at all."""
    plan = _plan(spark, sf_dir, "doc_repetition_scores")
    assert "Exchange" not in plan


def test_moving_avg_window_input_is_preaggregated(spark, sf_dir):
    """The ordered single-partition window must consume the per-day
    aggregate (tiny), not raw orders: partial+final hash aggregates appear
    below the window."""
    plan = _plan(spark, sf_dir, "daily_revenue_moving_avg")
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:]
