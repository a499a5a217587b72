"""Forced-skew tests for the bucket-size cap (VERDICT r3 #2).

The LSH / inverted-index skew failure: a boilerplate-heavy corpus puts
~10⁴ ids into ONE (band, sig) bucket (or one shingle's posting list), and
the naive collect-then-expand does the whole n²/2 pair expansion inside a
single task. ``_bucket_pair_rows`` salts oversized buckets into
sub-buckets and emits within+cross sub-bucket pairs — these tests prove
the OUTPUT is identical to the uncapped expansion while per-group input
stays ≤ 2·max_bucket rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.operators import dedup as D


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def test_capped_bucket_pairs_identical_to_uncapped(spark):
    # 3 buckets: one degenerate (120 ids), two small — pair sets must match
    rows = (
        [("big", i) for i in range(120)]
        + [("s1", i) for i in range(5)]
        + [("s2", 900 + i) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "k string, doc_id int")
    capped = D._bucket_pair_rows(df, ["k"], "doc_id", max_bucket=16)
    uncapped = D._bucket_pair_rows(df, ["k"], "doc_id", max_bucket=10**6)
    assert _pairs_set(capped) == _pairs_set(uncapped)
    # count check: C(120,2) + C(5,2) + C(2,2)
    assert capped.count() == 120 * 119 // 2 + 10 + 1


def test_capped_bucket_pairs_value_ordered_and_complete(spark):
    # one giant bucket of n ids: every pair exactly once, id_a < id_b,
    # verified by count + analytic checksums (no giant collect)
    n = 2000
    df = spark.createDataFrame([("b", i) for i in range(n)], "k string, doc_id long")
    out = D._bucket_pair_rows(df, ["k"], "doc_id", max_bucket=64)
    agg = out.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct(F.col("id_a"), F.col("id_b")).alias("dcnt"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("s"),
        F.min(F.col("id_b") - F.col("id_a")).alias("mingap"),
    ).first()
    c2 = n * (n - 1) // 2
    assert agg["cnt"] == c2 == agg["dcnt"]
    # each id k appears in n-1 pairs → sum over pairs of (a+b) = (n-1)·Σk
    assert agg["s"] == (n - 1) * n * (n - 1) // 2
    assert agg["mingap"] >= 1  # strict id_a < id_b everywhere


def test_capped_bucket_pairs_duplicate_rows_multiplicity(spark):
    # duplicated (key, id) input rows multiply like the join formulation:
    # A×2, B×1 in one bucket → (A,B) twice, (A,A) self-pairs dropped by
    # the caller-side id_a != id_b filter
    df = spark.createDataFrame(
        [("k", "A"), ("k", "A"), ("k", "B")], "k string, doc_id string"
    )
    out = (
        D._bucket_pair_rows(df, ["k"], "doc_id", max_bucket=1)
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .count()
        .collect()
    )
    assert [(r["id_a"], r["id_b"], r["count"]) for r in out] == [("A", "B", 2)]


def test_lsh_candidate_pairs_capped_matches_uncapped(spark):
    # near-identical docs all landing in shared buckets (the boilerplate
    # scenario) + some distinct ones
    docs = [(i, "common boilerplate header words " * 3) for i in range(60)]
    docs += [(100 + i, f"unique document number {i} with words {i * 7} {i * 13}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    sh = D.shingles(df, k=3)
    sig = D.minhash_signatures(sh, n_hashes=16)
    capped = D.lsh_candidate_pairs(sig, n_hashes=16, bands=4, max_bucket=8)
    uncapped = D.lsh_candidate_pairs(sig, n_hashes=16, bands=4, max_bucket=10**6)
    assert _pairs_set(capped) == _pairs_set(uncapped)
    assert capped.count() >= 60 * 59 // 2  # the boilerplate clique survives


def test_containment_pairs_capped_matches_join_formulation(spark):
    docs = [(i, "the shared boilerplate line repeated here") for i in range(30)]
    docs += [(50, "the shared boilerplate line repeated here plus unique tail content")]
    docs += [(60, "wholly different text with no overlap at all whatsoever")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    sh = D.shingles(df, k=3)
    capped = D.containment_pairs(sh, min_pct=80, max_posting=4)
    # join formulation as the oracle
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ref = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .filter(F.col("shared") * 100 >= 80 * F.least("size_a", "size_b"))
    )
    got = {tuple(r) for r in capped.select("id_a", "id_b", "shared", "size_a", "size_b").collect()}
    want = {tuple(r) for r in ref.select("id_a", "id_b", "shared", "size_a", "size_b").collect()}
    assert got == want and len(got) > 0


def test_materialized_sizes_gate_identical_output(spark):
    """materialize_sizes=True (the observed-max gate, r5 verdict ask #3)
    must be output-identical to the lazy plan on BOTH shapes: a skewed
    input (gate keeps the salted branch) and an unskewed one (gate drops
    it — the plan is small-branch-only)."""
    rows = (
        [("big", i) for i in range(120)]
        + [("s1", i) for i in range(5)]
        + [("s2", 900 + i) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "k string, doc_id int")
    lazy = _pairs_set(D._bucket_pair_rows(df, ["k"], "doc_id", max_bucket=16))
    skewed = D._bucket_pair_rows(
        df, ["k"], "doc_id", max_bucket=16, materialize_sizes=True
    )
    unskewed = D._bucket_pair_rows(
        df, ["k"], "doc_id", max_bucket=1000, materialize_sizes=True
    )
    assert _pairs_set(skewed) == lazy
    assert _pairs_set(unskewed) == lazy
    # the gate must actually prune: no union branch in the unskewed plan
    plan = unskewed._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
