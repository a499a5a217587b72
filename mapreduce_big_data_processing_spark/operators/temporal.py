"""Ordered/temporal joins the reference's MR surface cannot express and
Spark lacks as built-ins: as-of join and binned range join.

Both are implemented as compositions of existing DataFrame ops (the brief's
preferred path for custom operators) — no UDFs, no cartesian products:

  - ``asof_join``: the union + ordered-window trick. Tag both inputs, union
    them, and carry the most recent right-side values to each left row with
    ``last(..., ignorenulls=True)`` over a (key, time)-ordered window. ONE
    shuffle on the key columns — the same cost as a sort-merge join, with no
    row explosion and no inequality-join fallback (a naive
    ``l.ts >= r.ts`` join plans as BroadcastNestedLoop and is O(n·m)).
  - ``range_join``: interval containment as an equi-join. Explode each
    right-side interval into the fixed-width bins it covers, bin the left
    values, equi-join on the bin, then apply the exact residual predicate.
    Catalyst plans a hash join on the bin key instead of a nested loop.

At 100 TB: the as-of shuffle partitions by key (skew governed by hot keys —
salting applies as with any join); range-join bin width trades right-side
replication (≈ interval_width / bin_width rows per interval) against
bin-bucket selectivity, and the bin column can be a partition key so probes
prune files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Left as-of join: attach to each left row the nearest right row at or
    before it (``direction="backward"``) / at or after it (``"forward"``)
    in ``on`` order, matching on the ``by`` key columns.

    Semantics match DuckDB ``l ASOF LEFT JOIN r ON l.key = r.key AND
    l.ts >= r.ts`` (backward; ``<=`` for forward): inclusive comparison,
    unmatched left rows kept with nulls. ``tolerance`` (seconds) nulls out
    matches further than the given gap. Output: every left column plus
    ``prefix + on`` (the matched right timestamp) and ``prefix + c`` for
    each right value column. Ties on (key, ts) within the right side are
    broken arbitrarily (mirror DuckDB; make ``on`` unique per key for
    deterministic output).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = value_cols or [c for c in right.columns if c not in keys and c != on]
    out_cols = [prefix + on] + [prefix + c for c in rcols]
    clash = set(out_cols) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {clash}")

    r = right.select(
        *keys,
        F.col(on).alias("__t"),
        F.col(on).alias(prefix + on),
        *[F.col(c).alias(prefix + c) for c in rcols],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__t", F.col(on)).withColumn("__side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    t = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    res = unioned.select(
        *left.columns,
        "__side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_cols],
    ).filter(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        gap = F.col(on).cast("double") - F.col(prefix + on).cast("double")
        if direction == "forward":
            gap = -gap
        ok = gap <= F.lit(float(tolerance))
        res = res.select(
            *left.columns,
            *[F.when(ok, F.col(c)).alias(c) for c in out_cols],
        )
    return res


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Interval-containment join: left rows where ``left_val`` falls inside
    the right row's ``[right_lo, right_hi)`` interval (``closed="left"``;
    ``"both"`` for inclusive hi), as a bin equi-join + exact residual filter
    instead of the BroadcastNestedLoop a raw inequality join plans to.

    Intervals are exploded into the integer bins they cover (size the bin
    width so typical intervals span few bins); output is every left column
    plus every right column except the bin helper.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    bw = float(bin_width)
    lb = left.withColumn("__bin", F.floor(F.col(left_val) / bw))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bw),
                F.floor(F.col(right_hi) / bw),
            )
        ),
    )
    hi_pred = (
        F.col(left_val) < F.col(right_hi)
        if closed == "left"
        else F.col(left_val) <= F.col(right_hi)
    )
    return (
        lb.join(rb, "__bin")
        .filter((F.col(left_val) >= F.col(right_lo)) & hi_pred)
        .drop("__bin")
    )


def status_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD2-style validity intervals (gaps-and-islands): collapse each
    key's consecutive run of identical ``state_col`` values into one row
    ``[valid_from, valid_to)`` — the slowly-changing-dimension shape a CDC
    or feature-store pipeline materializes from an event log. Extends the
    reference's secondary-sort timeline (O2, `ppt/Ch7….pdf p.4-7`) from
    "order events per key" to "derive change intervals per key".

    ``valid_to`` is the next run's start (NULL for the open run);
    ``n_events`` counts the rows collapsed into the interval. Ties on
    ``ts_col`` are broken by ``tiebreak_col`` so the run segmentation is
    deterministic on both engines.

    ONE shuffle on ``key_col``; the change-flag window, the cumulative-sum
    window, the run groupBy, and the lead window all reuse that
    partitioning (plan pinned in tests/test_plan_shapes.py).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(state_col).over(w)
    marked = events.select(
        key_col,
        ts_col,
        tiebreak_col,
        state_col,
        F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0).alias("__chg"),
    )
    grouped = marked.select(
        key_col,
        ts_col,
        state_col,
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__grp"),
    )
    runs = grouped.groupBy(key_col, "__grp", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wlead = Window.partitionBy(key_col).orderBy("__grp")
    return runs.select(
        key_col,
        state_col,
        "valid_from",
        F.lead("valid_from").over(wlead).alias("valid_to"),
        "n_events",
    )
