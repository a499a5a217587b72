"""Deterministic sampling + sequence packing (operators/sampling.py).

Value-level correctness is covered by the DuckDB oracle
(test_oracle_parity); these tests pin the operator PROPERTIES —
determinism across runs, rate/quota bounds, packing invariants — and the
plan shapes that make the samplers scale (scan-only, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark.operators import sampling as SP


def _docs(spark, sf_dir):
    return catalog.load(spark, "documents", sf_dir)


def test_hash_sample_deterministic_and_rate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id for r in SP.hash_sample(docs, "doc_id", "4000").collect()}
    b = {r.doc_id for r in SP.hash_sample(docs, "doc_id", "4000").collect()}
    assert a == b and len(a) > 0
    n = docs.count()
    # md5 is uniform: 25% target, generous tolerance at small n
    assert 0.12 * n <= len(a) <= 0.40 * n
    # a lower threshold selects a strict subset (nested samples)
    sub = {r.doc_id for r in SP.hash_sample(docs, "doc_id", "2000").collect()}
    assert sub <= a


def test_hash_sample_is_scan_only(spark, sf_dir):
    plan = (
        SP.hash_sample(_docs(spark, sf_dir), "doc_id", "4000")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_mixture_sample_respects_per_group_rates(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = SP.weighted_mixture_sample(
        docs, "lang", "doc_id", {"en": "ffff"}, default_hex="0000"
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # rate 1.0 for en, 0.0 for everything else


def test_quota_per_group_bounds_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    q = SP.quota_per_group(docs, ["lang"], "doc_id", 5)
    per = {r.lang: r.n for r in q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(n == min(5, avail[lang]) for lang, n in per.items())
    again = SP.quota_per_group(docs, ["lang"], "doc_id", 5)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, again.collect()))


def test_pack_sequences_invariants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "lang",
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("n_tokens"),
    )
    packed = SP.pack_sequences(toks, "n_tokens", "lang", "doc_id", budget=512)
    rows = sorted(packed.collect(), key=lambda r: (r.lang, r.doc_id))
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        # stream offsets are exactly the running sum of prior doc lengths
        off = 0
        for r in rs:
            assert r.tok_start == off, (lang, r.doc_id)
            assert r.seq_id == off // 512
            off += r.n_tokens
        # seq_ids are non-decreasing and start at 0
        assert rs[0].seq_id == 0
    # total token mass is preserved (no doc dropped or double-packed)
    assert sum(r.n_tokens for r in rows) == sum(
        r.n_tokens for r in toks.collect()
    )


def test_weighted_sample_favors_heavy_rows_and_plans_topn(spark):
    """Rows at the weight cap must be selected at a visibly higher rate
    than weight-1 rows (max-of-64-uniforms vs one uniform), the output is
    exactly n, and the top-n runs as TakeOrderedAndProject (partial
    per-partition prune), never a global Sort."""
    from mapreduce_big_data_processing_spark.operators import sampling as SA

    rows = [(i, 64 if i % 2 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, w long")
    out = SA.weighted_sample(df, "k", F.col("w"), n=200)
    picked = [r["k"] for r in out.collect()]
    assert len(picked) == len(set(picked)) == 200
    heavy = sum(1 for k in picked if k % 2 == 0)
    # E[heavy] ~ 197 of 200 (w=64 wins ~64:1 per pair); even 10 sigma of
    # slack keeps this far above the unweighted 100
    assert heavy > 160
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_temperature_mixture_weights_math(spark):
    """Hand-checkable α=1/2 weights: sizes 100/400 → scores 10/20 →
    weights 1/3, 2/3; weights sum to 1 and order follows size."""
    df = spark.createDataFrame(
        [("a", 60), ("a", 40), ("b", 400)], "lang string, n_chars int"
    )
    out = {
        r["lang"]: r
        for r in SP.temperature_mixture_weights(df, "lang", "n_chars").collect()
    }
    assert out["a"]["n_docs"] == 2 and out["a"]["n_chars_total"] == 100
    assert abs(out["a"]["weight"] - 1 / 3) < 1e-9
    assert abs(out["b"]["weight"] - 2 / 3) < 1e-9


def test_lang_mixture_weights_rounding_margin():
    """No unrounded weight may sit within 1e-11 of a 1e-9 round-half
    boundary at the gate SF (the margin rule for float-rounding
    protocols)."""
    import duckdb

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["lang_mixture_weights"]
    unrounded = sql.replace("round(score / t.norm, 9)", "score / t.norm")
    assert unrounded != sql
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM"
        " '/root/testdata/sf0.01/documents.parquet'"
    )
    rows = con.sql(unrounded).fetchall()
    assert len(rows) == 5
    worst = min(abs((r[3] * 1e9) % 1 - 0.5) for r in rows)
    assert worst * 1e-9 > 1e-11, f"rounding margin too small: {worst * 1e-9}"


def test_kcenter_coreset_hand_worked(spark):
    """Points on a line: seed = lowest id (x=0), then FPS alternates ends
    and bisects — selection order and distances are hand-derivable."""
    pts = [(i, [float(x)]) for i, x in enumerate([0.0, 10.0, 4.0, 6.0, 0.0])]
    df = spark.createDataFrame(pts, "vec_id bigint, embedding array<float>")
    got = [
        (r["step"], r["vec_id"], r["dist_sq"])
        for r in SP.kcenter_coreset(df, k=4).orderBy("step").collect()
    ]
    # seed id0 (x=0); farthest is x=10 (d2=100); then x=4 (mind 16 vs
    # x=6's 16 -> wait: x=4: min(16,36)=16; x=6: min(36,16)=16; tie ->
    # lower id wins (id2, x=4); then x=6: min(36,16,4)=4.
    # id4 duplicates x=0 (mind=0) and is never selected.
    assert got == [(1, 0, 0.0), (2, 1, 100.0), (3, 2, 16.0), (4, 3, 4.0)]


def test_kcenter_coreset_fewer_distinct_than_k(spark):
    """With duplicates, only distinct-coverage points are selectable."""
    pts = [(0, [0.0]), (1, [0.0]), (2, [5.0])]
    df = spark.createDataFrame(pts, "vec_id bigint, embedding array<float>")
    got = SP.kcenter_coreset(df, k=4).orderBy("step").collect()
    assert [(r["step"], r["vec_id"]) for r in got] == [(1, 0), (2, 2)]
