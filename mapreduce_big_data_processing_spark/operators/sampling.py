"""Deterministic sampling + sequence packing for training-data pipelines.

The reference has no sampling surface (its corpora are consumed whole —
`final project/src/final_kNN_src/phase1/TF_IDF_Compute.java:444-546` loops
over every class folder); these operators are the driver-mandated
LLM-pipeline extension (BASELINE.json north star): curating a 100 TB corpus
requires *reproducible* subsetting, per-domain quotas, mixture weighting,
and packing documents into fixed token budgets.

Design rules for 100 TB:
  - All sampling is HASH-deterministic (md5 of a stable key), never
    `rand()`: re-runs, retried tasks, and incremental ingests select the
    same rows, so downstream dedup/training sees a stable corpus. A
    hash-threshold sample is a SCAN-ONLY narrow op — no shuffle, fully
    pushdown-friendly, trivially parallel at any scale.
  - Per-group quotas use a window only AFTER a cheap hash pre-filter
    (when quota << group size, pre-filtering at a safe over-sample rate
    bounds the shuffled volume; the window then runs over the survivors).
  - Packing partitions the window by a corpus shard key so no single
    ordered window spans the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket16(key: Column, chars: int = 4) -> Column:
    """Uniform hash bucket as a zero-padded hex prefix of md5(key).

    String compare against a hex literal gives an exact p = t/16^chars
    keep-rate. Kept as *hex text* (not an int) so the identical predicate
    runs on any SQL engine without 64-bit parsing builtins.
    """
    return F.substring(F.md5(key.cast("string")), 1, chars)


def hash_sample(df: DataFrame, key: str, threshold_hex: str) -> DataFrame:
    """Keep rows whose md5-bucket sorts below ``threshold_hex``.

    ``threshold_hex="4000"`` keeps exactly the rows in the first quarter of
    the 16^4 bucket space (≈25%), deterministically per key.
    """
    return df.filter(bucket16(F.col(key), len(threshold_hex)) < F.lit(threshold_hex))


def weighted_mixture_sample(
    df: DataFrame, group_col: str, key: str, rates_hex: dict[str, str],
    default_hex: str = "0000",
) -> DataFrame:
    """Per-group hash sampling with different keep-rates per group value —
    the mixture-weighting step of a training-data pipeline (e.g. keep 50%
    of `en`, 12.5% of everything else).

    The rate table folds into a single CASE expression evaluated in the
    scan stage: no join, no shuffle, whatever the number of groups.
    """
    thr = F.lit(default_hex)
    for val, t in sorted(rates_hex.items()):
        thr = F.when(F.col(group_col) == val, F.lit(t)).otherwise(thr)
    return df.filter(bucket16(F.col(key)) < thr)


def quota_per_group(
    df: DataFrame, group_cols: list[str], key: str, n: int,
) -> DataFrame:
    """Deterministic quota sample: the ``n`` rows with the smallest
    md5-bucket per group (ties broken by the key itself) — balanced
    per-domain subsetting with a stable, order-independent selection.

    At scale: one shuffle on ``group_cols`` for the window; when
    n << group size, callers should pre-filter with :func:`hash_sample`
    at an over-sampled rate first so only candidates shuffle.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        bucket16(F.col(key), 8), F.col(key)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame, tokens_col: str, shard_col: str, order_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    ``order_col`` order within each shard, and the resulting token stream
    is chopped into fixed ``budget``-token sequences. Each document is
    assigned the sequence its FIRST token lands in (`seq_id`) — the
    standard "concatenate then split at context length" packing used for
    LLM pretraining batches.

    Adds `tok_start` (offset of the document's first token in the shard
    stream) and `seq_id` (= tok_start // budget). A running-sum window
    partitioned by shard keeps state bounded: at 100 TB the shard key
    (e.g. source × date) caps any one ordered partition, and shards pack
    independently in parallel.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok_start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("tok_start", tok_start).withColumn(
        "seq_id", F.floor(F.col("tok_start") / budget)
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    n: int,
    max_weight: int = 64,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, selection
    probability increasing with weight (Efraimidis & Spirakis, IPL 2006).

    ES ranks items by u_i^(1/w_i) for uniform u_i; for INTEGER weights
    that statistic is distributed exactly as the max of w_i iid uniforms,
    so the float pow — whose last-ulp behavior differs across engines —
    can be replaced by integer arithmetic: explode w tickets per row,
    hash (key, ticket) to a 60-bit int, keep each row's MAX ticket hash,
    then take the global top-n. Every comparison is on bigints, so the
    selected set is bit-identical in any engine (the zero-float
    protocol), and re-runs/retries/incremental ingests pick the same
    rows (hash-deterministic, never rand()).

    ``max_weight`` caps the ticket fan-out: the exploded row count is
    sum(min(w, max_weight)) — the knob that keeps this scan-shaped at
    100 TB (beyond the cap, selection probability saturates; for
    unbounded weights use the float-ES path off the hash-match surface).
    The top-n itself is a per-partition prune + single-partition merge of
    n survivors, never a full sort.

    Output: input columns + ``priority`` (the winning ticket hash).
    """
    w = F.least(F.greatest(weight.cast("bigint"), F.lit(1)), F.lit(max_weight))
    pri = df.withColumn(
        "priority",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), w),
                lambda t: F.conv(
                    F.substring(
                        F.md5(F.concat_ws("#", F.col(key).cast("string"), t)),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(acc, x),
        ),
    )
    return pri.orderBy(F.desc("priority"), F.col(key)).limit(n)


def kcenter_coreset(
    points: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point sampling,
    Gonzalez 1985): pick the point farthest from the already-selected set,
    k times — the diversity-maximizing subset selection used to seed
    diverse training mixtures and balance semantic coverage (the
    complement of SemDeDup-style near-dup REMOVAL: this KEEPS spread).

    Deterministic protocol: the seed is the lowest id (no float argmax
    for step 1); each later step takes argmax of the running min-distance²
    with ties broken by id. Distances are left-fold sums over the double-
    cast vector (the kmeans-proven fold order), so both engines compare
    bit-identical doubles — no internal rounding protocol; only the
    DISPLAYED dist_sq is rounded (6 dp). Points at distance 0 from the
    selected set (exact duplicates) are never picked — they add no
    coverage — so corpora with < k distinct vectors return fewer rows.

    Scale shape: k scans of the cached point table, each against a
    broadcast 1-row center, then a top-1 (per-partition prune + merge,
    never a full sort). Driver state is nothing at all — the next center
    stays a 1-row DataFrame; ``localCheckpoint`` caps lineage exactly as
    the PageRank loop does.

    Output: (step 1..k, id, dist_sq) in selection order.
    """
    pts = points.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    seed = (
        pts.orderBy(F.asc(id_col))
        .limit(1)
        .select(
            F.lit(1).alias("step"),
            F.col(id_col),
            F.col("v"),
            # 0.0, not NULL: a NULL mixed into a float column breaks
            # naive row-sort comparators (the driver protocol sorts
            # columns BY NAME, putting dist_sq first) — and the seed's
            # distance-to-selected-set is genuinely 0 once it's selected
            F.lit(0.0).alias("dist_sq"),
        )
        .localCheckpoint(eager=True)
    )
    selected = [seed]
    cur = pts.withColumn("mind", F.lit(float("inf"))).localCheckpoint(
        eager=True
    )
    for step in range(2, k + 1):
        c = F.broadcast(selected[-1].select(F.col("v").alias("c")))
        cur = (
            cur.crossJoin(c)
            .withColumn("mind", F.least(F.col("mind"), d2))
            .drop("c")
            .localCheckpoint(eager=True)
        )
        nxt = (
            cur.filter(F.col("mind") > 0)
            .orderBy(F.desc("mind"), F.asc(id_col))
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                F.col(id_col),
                F.col("v"),
                F.col("mind").alias("dist_sq"),
            )
            .localCheckpoint(eager=True)
        )
        selected.append(nxt)
    out = selected[0]
    for s in selected[1:]:
        out = out.unionByName(s)
    return out.select("step", id_col, F.round("dist_sq", 6).alias("dist_sq"))


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str,
    size_col: str,
) -> DataFrame:
    """Temperature-scaled multinomial mixture weights — the upstream step
    that DERIVES the per-group rates :func:`weighted_mixture_sample`
    consumes: p_g ∝ (size_g)^α at sampling temperature α=1/2 (the
    low-resource-upweighting trick of mT5/XLM-R; Conneau et al. ACL'20
    use α≈0.3, Xue et al. NAACL'21 α=0.3-0.7 — 1/2 is in-range).

    α is FIXED at 1/2 deliberately: IEEE 754 requires sqrt to be
    correctly rounded, so both engines compute bit-identical scores from
    the identical integer sizes, while pow(x, α) is platform-libm
    dependent (no correct-rounding guarantee) and would need a rounding
    protocol. The normalizer folds the scores in group-name order
    (sort_array + left fold), pinning the float addition order across
    engines — the ordered-fold pattern the ANN oracles rely on.

    Scale shape: one partial-agg shuffle to group cardinality; everything
    after runs on the group-count-sized table.

    Output: (group, n_docs, <size_col>_total, weight) with weight rounded
    at 9 decimals on the derived ratio.
    """
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias(f"{size_col}_total"),
    )
    s = g.withColumn(
        "__score", F.sqrt(F.col(f"{size_col}_total").cast("double"))
    )
    norm = s.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(group_col).alias("k"), F.col("__score").alias("v")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("__norm")
    )
    return (
        s.crossJoin(F.broadcast(norm))
        .select(
            group_col,
            "n_docs",
            f"{size_col}_total",
            F.round(F.col("__score") / F.col("__norm"), 9).alias("weight"),
        )
    )
