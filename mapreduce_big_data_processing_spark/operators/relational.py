"""Relational operators (SURVEY.md §2.2-§2.6).

The reference implements these as hand-wired MapReduce stages — reduce-side
joins with source tags (`ppt/Ch7….pdf p.41-53`), replicated map-side joins
from the distributed cache (`ppt/Ch7….pdf p.54-57`), combiner partial
aggregation (`final project/src/final_kNN_src/phase1/TF_IDF_Compute.java:110-138`),
TotalOrderPartitioner sorts (`ppt/Ch5….pdf p.32-38`). Every one of those
manual mechanisms is a built-in here: Catalyst picks broadcast vs
sort-merge joins, hash aggregates always run partial+final, and `orderBy`
range-partitions by sampling. The functions below exist to name the
capability surface and keep the 100 TB posture in one place (broadcast
hints for dimension tables, no driver-side collection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Projections / filters (P1-P2)
# ---------------------------------------------------------------------------


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """P1 — column projection; prunes the parquet scan to ReadSchema."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """P2 — predicate filter; pushed into the scan by Catalyst."""
    return df.filter(predicate)


def filter_not_in(df: DataFrame, col: str, deny: DataFrame, deny_col: str) -> DataFrame:
    """P2 stopword-style exclusion as a (broadcast) anti-join.

    The reference loads the deny list into every task's memory from the
    distributed cache (`…/final_NB_src/phase1/Count/CountMapper.java:28-45`);
    an anti-join against a broadcast side is the same data movement with
    planner-managed memory.
    """
    d = deny.select(F.col(deny_col).alias("__deny_key")).distinct()
    return df.join(F.broadcast(d), df[col] == F.col("__deny_key"), "left_anti")


# ---------------------------------------------------------------------------
# Joins (J1-J6)
# ---------------------------------------------------------------------------


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J1/J4/J5 — shuffle equi-join; Catalyst chooses SMJ/SHJ/BHJ + reorders
    multi-way chains (the reference needed one MR job per 2-way join,
    `ppt/Ch7….pdf p.59`)."""
    return left.join(right, on, how)


def broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J2 — map-side replicated join (`ppt/Ch7….pdf p.54-57`): explicit
    broadcast hint so no shuffle of the big side ever happens, regardless of
    stats. Use for dimension tables at any scale."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J3 — existence filter (`ppt/Ch7….pdf p.58` semi-join section)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Complement of J3; the reference expresses it as tag-count==1 in the
    reduce-side join combine step (`ppt/Ch7….pdf p.51`)."""
    return left.join(right, on, "left_anti")


# ---------------------------------------------------------------------------
# Aggregations (A1-A11)
# ---------------------------------------------------------------------------


def group_count(df: DataFrame, *keys: str, out: str = "cnt") -> DataFrame:
    """A1 — WordCount shape (`ppt/Ch2….pdf p.17-20`). Partial aggregation
    (the reference's hand-written combiner) is automatic."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def group_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """A3 — grouped aggregation over a composite key; the reference encodes
    the key as `cls + "#" + wordNo`
    (`…/final_NB_src/phase2/TrainModel/TrainModelMapper.java:26`)."""
    return df.groupBy(*keys).agg(*aggs)


def ratio_of_totals(df: DataFrame, hit: Column, out: str = "ratio") -> DataFrame:
    """A4 — accuracy-style T/(T+F) aggregate
    (`…/final_kNN_src/phase2/AccuracyReducer.java:12-29`)."""
    return df.agg(F.avg(F.when(hit, 1.0).otherwise(0.0)).alias(out))


def group_fraction(df: DataFrame, keys: Sequence[str], val: str, out: str = "frac") -> DataFrame:
    """A5/A14 — per-group normalized frequency (value / group total).

    The reference smuggles the group total through the sorted KV stream as a
    `!` sentinel record (`…/TF_IDF_Compute.java:103-131`); a window total
    needs no in-band trick.
    """
    w = Window.partitionBy(*keys)
    return df.withColumn(out, F.col(val) / F.sum(val).over(w))


def histogram(df: DataFrame, key: str, out_key: str = "bucket", out: str = "freq") -> DataFrame:
    """A8 — two-level aggregation (patent citation histogram,
    `ppt/Ch5….pdf p.76-83`): one declarative query instead of two chained
    jobs."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_key))
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias(out))
    )


def inverted_list(
    df: DataFrame, key: str, value: str, out: str = "postings", as_string: bool = True
) -> DataFrame:
    """A9 — group-concat postings list (`ppt/Ch5….pdf p.73-75`), sorted for
    determinism (collect_list order is not)."""
    lst = F.sort_array(F.collect_set(value))
    if as_string:
        lst = F.array_join(lst.cast("array<string>"), ",")
    return df.groupBy(key).agg(lst.alias(out))


def count_distinct_per_group(
    df: DataFrame,
    key: str,
    value: str,
    out: str = "n_distinct",
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """A11 — countries-per-year shape (`ppt/Ch5….pdf p.88-89`). ``approx``
    switches to HLL (`approx_count_distinct`) for the 100 TB path where the
    exact dedup shuffle is the bottleneck; ``rsd`` is its target relative
    standard deviation (smaller = bigger sketch, tighter estimate)."""
    agg = (
        F.approx_count_distinct(value, rsd) if approx else F.countDistinct(value)
    ).alias(out)
    return df.groupBy(key).agg(agg)


# ---------------------------------------------------------------------------
# Skew handling (SURVEY §4: "avoid overloaded reducers", ppt/Ch5….pdf p.34)
# ---------------------------------------------------------------------------


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys, salt) — splitting each hot key across ``salt_buckets`` reducers —
    phase 2 merges per key. Results are identical to the direct groupBy for
    decomposable aggregates. ``aggs`` maps output name → (fn, col) with fn
    in {count, sum, min, max}.

    At 100 TB this is the manual fallback when AQE skew handling can't
    apply (e.g. single hot key in a groupBy, not a join). The reference's
    only recourse was a custom Partitioner.
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        phase1_aggs.append(
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
        )
    p1 = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase2 = [merge[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    return p1.groupBy(*keys).agg(*phase2)


def skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Salted inner equi-join for a skewed big side: big rows get a random
    salt, the small side is replicated ``salt_buckets`` times, and the join
    key becomes (key, salt) — spreading each hot key over many tasks.
    Equivalent rows to ``big.join(small, key)``.

    Prefer AQE's skew-join splitting when stats expose the skew; this is
    the explicit form for planned-ahead hot keys.
    """
    b = big.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [key, "__salt"]).drop("__salt")


# ---------------------------------------------------------------------------
# Sorts / top-k (O1-O5)
# ---------------------------------------------------------------------------


def total_sort(df: DataFrame, *order: Column | str) -> DataFrame:
    """O1 — total-order sort. The reference needs TotalOrderPartitioner with
    an input sampler + trie (`ppt/Ch5….pdf p.32-38`); Spark's range
    partitioner samples automatically under `orderBy`."""
    return df.orderBy(*order)


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """O4 — global top-k; physical plan is TakeOrderedAndProject (per-
    partition heaps + driver merge), no full sort at any scale."""
    return df.orderBy(*order).limit(k)


def global_rank(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global rank for EVERY row — the TeraSort-rank /
    stable-sample-id assignment a training pipeline needs over the whole
    corpus (shard-stable ids, curriculum order), where
    ``row_number().over(Window.orderBy(...))`` would funnel 100 TB
    through ONE partition (WindowGroupLimit only rescues top-k filters,
    not full output).

    Two-pass shape (`ppt/Ch5….pdf p.32-38` — the reference needs
    TotalOrderPartitioner + input sampler for the same plan):
    range-partition + local sort on the order keys (Spark samples the
    boundaries), ONE Arrow pass appends each row's intra-partition
    index (zero shuffle, order-preserving), partition row-counts
    (≤ num_partitions rows — sketch-sized) collect to the driver and
    cumulate into offsets that broadcast back; rank = offset + index + 1.
    Ranks are independent of where the sampled boundaries land, so the
    result is deterministic for any tie-free ``order`` even though the
    partitioning itself is sample-derived. The range-partitioned sorted
    The ``.cache()`` on the range-partitioned input is CORRECTNESS-load-
    bearing, not an optimization: the count pass and the final
    projection are separate jobs, and without the cache each job
    compiles its own physical plan and RE-SAMPLES the range boundaries —
    the offsets collected from one partitioning then mis-add against the
    other's partition populations (measured at the 100x fixture:
    hash-mismatch with ranks shifted by thousands; invisible at toy SFs
    where the samplings agree). The cache pins ONE partitioning for both
    consumers. It is corpus-sized and has no owner to unpersist it —
    the documented cost of the only correct two-pass form."""
    for c in ("__pid", "__idx", "__off", out):
        if c in df.columns:
            # withColumn would silently REPLACE the caller's column and
            # the final drop would delete it (the output-collision rule)
            raise ValueError(f"global_rank: input already carries {c!r}")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )

    def add_index(batches):
        running = 0
        for pdf in batches:
            pdf = pdf.assign(__idx=range(running, running + len(pdf)))
            running += len(pdf)
            yield pdf

    from pyspark.sql import types as T

    # NOT parts.schema.add(...): StructType.add MUTATES the instance the
    # DataFrame hands out, corrupting the input plan's resolved columns
    schema = T.StructType(
        list(parts.schema.fields) + [T.StructField("__idx", T.LongType())]
    )
    indexed = parts.mapInPandas(add_index, schema=schema)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:  # ascending pid == ascending range
        offsets.append((pid, acc))
        acc += cnt
    off = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __off long")
    )
    return (
        indexed.join(off, "__pid")
        .withColumn(out, F.col("__off") + F.col("__idx") + F.lit(1))
        .drop("__pid", "__idx", "__off")
    )


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int, out: str = "rn"
) -> DataFrame:
    """O5 — per-group bounded top-k; the reference maintains a manual K-best
    buffer per record (`…/final_kNN_src/phase2/KNNMapper.java:113-160`)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(out, F.row_number().over(w)).filter(F.col(out) <= k)


def secondary_sorted_list(
    df: DataFrame, keys: Sequence[str], order_col: str, value_cols: Sequence[str], out: str = "items"
) -> DataFrame:
    """O2/A10 — values sorted within key. The reference moves the value into
    a composite key + custom partitioner (`…/TF_IDF_Compute.java:141-151`,
    `ppt/Ch7….pdf p.3-7`); sort_array over collected structs gives the same
    result without touching the shuffle."""
    struct = F.struct(order_col, *value_cols)
    return df.groupBy(*keys).agg(F.sort_array(F.collect_list(struct)).alias(out))


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    distinct_mode: str = "approx",
    rsd: float = 0.015,
) -> DataFrame:
    """Single-pass table profiling (ANALYZE-style data-quality summary) —
    the first thing a pipeline runs against a new 100 TB ingest: per column,
    row count, null count, distinct count, and typed min/max (numerics
    rounded to 6 as ``min_num``/``max_num``, timestamps as ``min_ts``/
    ``max_ts``, strings as ``min_str``/``max_str`` — typed columns sidestep
    cross-engine float/timestamp formatting entirely).

    ONE aggregation over one scan. ``distinct_mode="approx"`` (default)
    uses HLL sketches (`approx_count_distinct`, target ``rsd``): constant
    memory per column, the only posture that survives wide tables of
    high-cardinality columns — this is what real profilers (Deequ et al.)
    do. ``distinct_mode="exact"`` plans the N exact distincts as a single
    Expand (rows × N-way duplication): exact, but per-task dedup state
    grows with column cardinality where the sketches stay constant.
    Measured at a 6-column × 10 M-row table (BENCH_SCALE.md): exact runs
    4× slower than approx (36.9 vs 9.3 s on the repo session's 16 GB
    heap), and the gap widens with cardinality — hence exact's
    verification-path (not production-default) role. Either mode needs a
    heap sized to tasks × (columnar-read + agg-buffer) working set: a
    default 1 GB local[32] JVM dies on this table's string min/max
    sort-aggregate alone (`session.get_session` sizes this; a plain
    default-conf session does not).
    """
    if distinct_mode not in ("approx", "exact"):
        raise ValueError(f"distinct_mode must be approx|exact, got {distinct_mode!r}")
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        nd = (
            F.count_distinct(c)
            if distinct_mode == "exact"
            else F.approx_count_distinct(c, rsd)
        )
        aggs.append(nd.alias(f"__nd_{c}"))
        t = dtypes[c]
        if t in ("timestamp", "timestamp_ntz", "date"):
            aggs.append(F.min(c).cast("timestamp").alias(f"__mints_{c}"))
            aggs.append(F.max(c).cast("timestamp").alias(f"__maxts_{c}"))
        elif t == "string":
            aggs.append(F.min(c).alias(f"__minstr_{c}"))
            aggs.append(F.max(c).alias(f"__maxstr_{c}"))
        else:  # numeric
            aggs.append(F.round(F.min(c).cast("double"), 6).alias(f"__minnum_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 6).alias(f"__maxnum_{c}"))
    row = df.agg(*aggs)

    def _get(prefix: str, c: str) -> Column:
        name = f"__{prefix}_{c}"
        return F.col(name) if name in row.columns else F.lit(None)

    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            _get("minnum", c).cast("double").alias("min_num"),
            _get("maxnum", c).cast("double").alias("max_num"),
            _get("minstr", c).cast("string").alias("min_str"),
            _get("maxstr", c).cast("string").alias("max_str"),
            _get("mints", c).cast("timestamp").alias("min_ts"),
            _get("maxts", c).cast("timestamp").alias("max_ts"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_constraints(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """Data-validation gate (Deequ-style expectations): evaluate named row
    predicates in ONE aggregation over one scan — each rule contributes a
    conditional count of violating rows; the pipeline gates on
    ``sum(violations) == 0``.

    ``rules``: (rule_name, boolean Column that is TRUE when the row
    SATISFIES the rule). NULL predicate results count as violations (SQL
    three-valued logic would otherwise let NULLs slip through a CHECK).

    Output: (rule, n_rows, violations, passed). Set-level rules that need
    state beyond a row predicate (uniqueness, referential integrity) don't
    fit a row predicate — compose them from `profile_table` distincts or
    an anti-join and union the result; keeping this operator single-pass
    row-predicate-only is what makes it free to run on every ingest.
    """
    if not rules:
        raise ValueError("check_constraints: no rules")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)).alias(
                f"__v_{name}"
            )
        )
    row = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{name}").alias("violations"),
            (F.col(f"__v_{name}") == 0).alias("passed"),
        )
        for name, _ in rules
    ]
    return row.select(F.explode(F.array(*per_rule)).alias("r")).select("r.*")


def exact_order_statistics(
    df: DataFrame,
    value_col: str,
    fractions: "tuple[float, ...]" = (0.25, 0.5, 0.75),
    bins: int = 1024,
) -> DataFrame:
    """EXACT order statistics (value at rank floor(n*f) in the sorted
    multiset) WITHOUT a total-order sort — the distributed selection
    algorithm (Blum et al.'s problem in two scan-sized passes):

      1. one scan: (min, max, count) + a ``bins``-cell histogram of the
         value range. Driver state is O(bins) integers — model-sized,
         like a codebook, never data-sized.
      2. cumulative counts locate each target rank's bin; ONE more pass
         filters to just those bins (~n/bins rows each) and ranks inside
         them (window per bin) — the only exchange moves the target
         bins' rows, a ``len(fractions)/bins`` fraction of the data.

    A total sort would range-shuffle the WHOLE table; percentile_approx
    avoids that but is approximate. This is the exact answer at
    sample-the-bins cost. Binning arithmetic is engine-internal only:
    the result is the sorted-multiset value, independent of how bins
    split it (ties land in one bin; values come straight from the data
    with no arithmetic, so any engine reproduces them bit-for-bit).

    Output: (rank bigint, value) — one row per requested fraction,
    rank = max(floor(n*f), 1), duplicates collapsed.
    """
    import math
    from fractions import Fraction

    vc = F.col(value_col)
    mn, mx, n, n_nonnull = df.agg(
        F.min(vc).cast("double"),
        F.max(vc).cast("double"),
        F.count(F.lit(1)),
        F.count(vc),
    ).first()
    if not n:
        raise ValueError("exact_order_statistics: empty input")
    if n_nonnull != n:
        # NULLs fall out of the histogram but would inflate n, so a rank
        # could point past the cumulative mass and silently return no row.
        raise ValueError(
            f"exact_order_statistics: {value_col} contains "
            f"{n - n_nonnull} NULLs — filter them before calling"
        )
    # rank = floor(n*f) computed over RATIONALS: float truncation int(n*f)
    # disagrees with the mathematical floor for non-binary fractions
    # (n=10, f=0.7: int(10*0.7) == 6 because 0.7 < 7/10 in binary).
    ranks = sorted(
        {
            max(math.floor(Fraction(f).limit_denominator(10**9) * n), 1)
            for f in fractions
        }
    )
    if mn == mx:  # degenerate range: every row is the answer
        spark = df.sparkSession
        return spark.createDataFrame(
            [(r, mn) for r in ranks], f"rank bigint, {value_col} double"
        )
    span = mx - mn
    bin_expr = F.least(
        F.lit(bins - 1),
        F.floor((vc.cast("double") - F.lit(mn)) / F.lit(span) * F.lit(bins)),
    ).cast("int")
    hist = {
        r["__bin"]: r["cnt"]
        for r in df.select(bin_expr.alias("__bin"))
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    targets = []  # (rank, bin, rank within bin)
    for rank in ranks:
        cum = 0
        for b in range(bins):
            c = hist.get(b, 0)
            if cum + c >= rank:
                targets.append((rank, b, rank - cum))
                break
            cum += c
    need = sorted({b for _, b, _ in targets})
    from pyspark.sql import Window

    ranked = (
        df.select(vc.cast("double").alias("__v"), bin_expr.alias("__bin"))
        .filter(F.col("__bin").isin(need))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__bin").orderBy("__v")
            ),
        )
    )
    picks = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.lit(lr).alias("lr"), F.lit(rank).alias("rank"))
            for rank, b, lr in targets
        ]
    )
    hit = F.filter(
        picks,
        lambda p: (p["b"] == F.col("__bin")) & (p["lr"] == F.col("__rn")),
    )
    return (
        ranked.withColumn("__hit", hit)
        .filter(F.size("__hit") > 0)
        .select(
            F.explode("__hit").alias("p"), F.col("__v").alias(value_col)
        )
        .select(F.col("p.rank").cast("bigint").alias("rank"), value_col)
    )
