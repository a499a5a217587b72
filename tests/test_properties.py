"""Property-based tests (SURVEY §5.5): invariants the operators must hold
regardless of data — partition-count independence (the combiner property,
`ppt/Ch9….pdf p.27`), re-run determinism, union associativity."""

from __future__ import annotations

import pytest

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark.operators import dedup as D
from mapreduce_big_data_processing_spark.operators import text as TX

WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=0,
    max_size=12,
)
DOCS = st.lists(WORDS, min_size=1, max_size=8)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mkdocs(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )


@given(docs=DOCS)
@_slow
def test_wordcount_partition_invariance(spark, docs):
    df = _mkdocs(spark, docs)
    outs = []
    for parts in (1, 5):
        toks = TX.tokenize(df.repartition(parts), keep_cols=["doc_id"])
        outs.append(
            sorted((r.word, r.cnt) for r in TX.word_count(toks).collect())
        )
    assert outs[0] == outs[1]


@given(docs=DOCS)
@_slow
@pytest.mark.slow
def test_cooccurrence_union_associativity(spark, docs):
    """counting over A∪B == count(A) + count(B) merged (distributivity of
    the grouped count over disjoint unit-disjoint unions)."""
    df = _mkdocs(spark, docs)
    a = df.filter(F.col("doc_id") % 2 == 0)
    b = df.filter(F.col("doc_id") % 2 == 1)
    whole = {
        (r.w1, r.w2): r.cnt
        for r in TX.cooccurrence_pairs(
            TX.tokenize(df, keep_cols=["doc_id"]), symmetric=False
        ).collect()
    }
    merged: dict = {}
    for part in (a, b):
        toks = TX.tokenize(part, keep_cols=["doc_id"])
        for r in TX.cooccurrence_pairs(toks, symmetric=False).collect():
            merged[(r.w1, r.w2)] = merged.get((r.w1, r.w2), 0) + r.cnt
    assert whole == merged


@given(docs=DOCS)
@_slow
@pytest.mark.slow
def test_minhash_partition_invariance(spark, docs):
    df = _mkdocs(spark, docs)
    sigs = []
    for parts in (1, 4):
        sh = D.shingles(df.repartition(parts), k=2)
        sig = D.minhash_signatures(sh, n_hashes=4, portable=True)
        sigs.append(sorted((r.doc_id, r.h, r.minhash) for r in sig.collect()))
    assert sigs[0] == sigs[1]


@given(texts=st.lists(st.text(alphabet=string.ascii_lowercase + " ", max_size=30), min_size=1, max_size=6))
@_slow
def test_exact_dedup_canonical_is_member(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = D.exact_dedup(df).collect()
    ids = {r.doc_id for r in out}
    assert ids == set(range(len(texts)))
    for r in out:
        assert r.canonical_id in ids
        assert (r.is_duplicate == 0) == (r.doc_id == r.canonical_id) or (
            r.doc_id != r.canonical_id
        )


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """percentile_approx at accuracy 10000 must land within a tight
    neighborhood of the exact percentiles, and the registered error-bound
    query's rank flags must all come back TRUE (the oracle contract)."""
    from pyspark.sql import functions as F

    from mapreduce_big_data_processing_spark import catalog, queries as Q

    flags = Q.QUERIES["approx_value_percentiles"](spark, sf_dir).collect()[0]
    for label in ["ok_p50", "ok_p90", "ok_p95", "ok_p99"]:
        assert flags[label], label
    ev = catalog.load(spark, "events", sf_dir)
    approx = ev.agg(
        F.percentile_approx("value", [0.5, 0.9, 0.95, 0.99], 10000).alias("q")
    ).collect()[0].q
    exact = ev.agg(
        F.expr("percentile(value, array(0.5, 0.9, 0.95, 0.99))").alias("q")
    ).collect()[0].q
    for i, label in enumerate(["p50", "p90", "p95", "p99"]):
        assert abs(approx[i] - exact[i]) <= max(0.05 * abs(exact[i]), 1e-6), (
            label, approx[i], exact[i],
        )


def test_chunk_dedup_partition_invariance(spark):
    """Passage dedup must be independent of input partitioning: the
    first-occurrence rule is defined by (doc_id, pos) order, not physical
    layout."""
    from mapreduce_big_data_processing_spark.operators import curation as C

    docs = spark.createDataFrame(
        [(i, f"common passage here unique{i} tail words") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, C.chunk_dedup(docs.repartition(1), words_per_chunk=3).collect())
    )
    b = sorted(
        map(tuple, C.chunk_dedup(docs.repartition(7), words_per_chunk=3).collect())
    )
    assert a == b


def test_heavy_hitters_partition_invariance(spark):
    """Sketch+verify heavy hitters: MG summaries differ per layout, but
    the verified OUTPUT must not (it equals GROUP BY + HAVING)."""
    from mapreduce_big_data_processing_spark.operators import sketches as SK

    # domain (52) > capacity (21) forces MG eviction, while capacity still
    # satisfies the guarantee bound N/(capacity+1) < ceil(min_frac*N)
    rows = (
        [("hotA",)] * 300
        + [("hotB",)] * 250
        + [(f"k{i}",) for i in range(50) for _ in range(10)]
    )
    df = spark.createDataFrame(rows, "k string")
    outs = []
    for n in (1, 4, 13):
        outs.append(
            sorted(
                map(
                    tuple,
                    SK.heavy_hitters(
                        df.repartition(n), "k", min_frac=0.1, capacity=21
                    ).collect(),
                )
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == [("hotA", 300), ("hotB", 250)]


def test_bm25_partition_invariance(spark):
    from mapreduce_big_data_processing_spark.operators.text import bm25_search

    docs = spark.createDataFrame(
        [(i, "spark window hash " * (1 + i % 3) + f"filler{i}") for i in range(30)],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_search(docs.repartition(1), ["spark", "hash"]).collect()
    }
    b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_search(docs.repartition(8), ["spark", "hash"]).collect()
    }
    assert a == b


@given(docs=DOCS)
@_slow
def test_repetition_scores_match_python_model(spark, docs):
    """Differential: the array-expression repetition metrics equal a direct
    Python computation of the same definitions (distinct/total words,
    distinct/total 5-grams, modal-2-gram share) on arbitrary word lists —
    including the n<5 / n<2 / empty-doc edge cases."""
    from collections import Counter

    from mapreduce_big_data_processing_spark.operators import textstats as TS

    def model(ws):
        n = len(ws)
        dupw = 1.0 - len(set(ws)) / n if n else 0.0
        g5 = [" ".join(ws[i : i + 5]) for i in range(n - 4)]
        dup5 = 1.0 - len(set(g5)) / len(g5) if g5 else 0.0
        g2 = [" ".join(ws[i : i + 2]) for i in range(n - 1)]
        top2 = max(Counter(g2).values()) / len(g2) if g2 else 0.0
        return (n, round(dupw, 6), round(dup5, 6), round(top2, 6))

    df = _mkdocs(spark, docs)
    got = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.dup_5gram_frac, r.top_2gram_frac)
        for r in TS.repetition_scores(df).collect()
    }
    want = {i: model(ws) for i, ws in enumerate(docs)}
    assert got == want


@given(docs=DOCS)
@_slow
@pytest.mark.slow
def test_bpe_train_matches_python_model(spark, docs):
    """Differential: the distributed BPE trainer equals a direct Python
    implementation (freq-weighted adjacent pair counts, count-then-
    lexicographic argmax, leftmost-non-overlapping merge) on arbitrary
    small corpora — including self-pair chains and pair exhaustion."""
    from collections import Counter

    words = [w for ws in docs for w in ws]
    if not words:
        return

    def model(words, n_merges):
        wf = Counter(words)
        seqs = {w: list(w) for w in wf}
        out = []
        for step in range(1, n_merges + 1):
            pc = Counter()
            for w, f in wf.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += f
            if not pc:
                return out, True
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, a, b, a + b, cnt))
            for w in seqs:
                s = seqs[w]
                o, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        o.append(a + b)
                        i += 2
                    else:
                        o.append(s[i])
                        i += 1
                seqs[w] = o
        return out, False

    want, exhausted = model(words, 3)
    df = _mkdocs(spark, docs)
    if exhausted:
        import pytest

        with pytest.raises(ValueError, match="pairs exhausted"):
            TX.bpe_train(df, n_merges=3).collect()
        return
    got = [tuple(r) for r in TX.bpe_train(df, n_merges=3).collect()]
    assert got == want


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),             # user_id
        st.integers(min_value=0, max_value=20),            # ts (seconds)
        st.sampled_from(["view", "click", "purchase"]),    # event_type
    ),
    min_size=0,
    max_size=25,
)


@given(evs=EVENTS)
@_slow
def test_funnel_matches_python_model(spark, evs):
    """Differential: funnel_stages equals a direct Python computation of
    first-touch stage times (strictly-after semantics) on arbitrary small
    event streams — including ts ties, repeated stages, and users who
    skip stages."""
    import datetime

    from mapreduce_big_data_processing_spark.operators import windows as W

    stages = ["view", "click", "purchase"]

    def model(evs):
        by_user: dict[int, list[tuple[int, str]]] = {}
        for u, t, ty in evs:
            by_user.setdefault(u, []).append((t, ty))
        reached = [0] * len(stages)
        for rows in by_user.values():
            prev_t = None
            for k, stage in enumerate(stages):
                cand = [
                    t for t, ty in rows
                    if ty == stage and (prev_t is None or t > prev_t)
                ]
                if not cand:
                    break
                prev_t = min(cand)
                reached[k] += 1
        return {k + 1: n for k, n in enumerate(reached)}

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, u, base + datetime.timedelta(seconds=t), ty)
            for i, (u, t, ty) in enumerate(evs)
        ]
        or [(0, 1, base, "error")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {r.stage: r.n_users for r in W.funnel_stages(df, stages).collect()}
    want = model(evs) if evs else {1: 0, 2: 0, 3: 0}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
            st.one_of(st.none(), st.sampled_from(["a", "b", ""])),
        ),
        min_size=1,
        max_size=20,
    )
)
@_slow
def test_profile_matches_pandas_model(spark, rows):
    """Differential: profile_table(exact) equals direct Python stats —
    null counts, distincts, typed min/max — on random nullable data."""
    from mapreduce_big_data_processing_spark.operators import relational as R

    df = spark.createDataFrame(rows, "x int, s string")
    got = {r.col_name: r for r in R.profile_table(df, distinct_mode="exact").collect()}
    xs = [x for x, _ in rows if x is not None]
    ss = [s for _, s in rows if s is not None]
    n = len(rows)
    assert got["x"].n_rows == n and got["s"].n_rows == n
    assert got["x"].n_nulls == n - len(xs)
    assert got["s"].n_nulls == n - len(ss)
    assert got["x"].n_distinct == len(set(xs))
    assert got["s"].n_distinct == len(set(ss))
    assert got["x"].min_num == (round(float(min(xs)), 6) if xs else None)
    assert got["x"].max_num == (round(float(max(xs)), 6) if xs else None)
    assert got["s"].min_str == (min(ss) if ss else None)
    assert got["s"].max_str == (max(ss) if ss else None)


@given(docs=DOCS)
@_slow
@pytest.mark.slow
def test_bigram_lm_matches_python_model(spark, docs):
    """Differential: the distributed bigram-LM filter equals a direct
    Python train-and-score of the same definitions (md5 hash-split,
    add-0.5 smoothing, V+1 OOV slot) on arbitrary word lists — including
    docs with <2 tokens (no rows) and an empty train split (all-smoothing
    scores)."""
    import hashlib
    import math

    from mapreduce_big_data_processing_spark.operators import textstats as TS

    def is_train(doc_id: int) -> bool:
        h = hashlib.md5(f"{doc_id}lm".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60) < 0.75

    c12: dict[tuple[str, str], int] = {}
    for i, ws in enumerate(docs):
        if is_train(i):
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    vocab = set()
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        vocab.update((a, b))
    V = len(vocab)

    def model(i, ws):
        bg = list(zip(ws, ws[1:]))
        if not bg:
            return None
        ce = sum(
            -math.log((c12.get(p, 0) + 0.5) / (c1.get(p[0], 0) + 0.5 * (V + 1)))
            for p in bg
        ) / len(bg)
        return (int(is_train(i)), len(bg), round(ce, 6))

    df = _mkdocs(spark, docs)
    got = {
        r.doc_id: (r.is_train, r.n_bigrams, r.cross_entropy)
        for r in TS.bigram_lm_cross_entropy(df).collect()
    }
    want = {i: m for i, ws in enumerate(docs) if (m := model(i, ws)) is not None}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.booleans()), min_size=2, max_size=40
    ).filter(lambda r: any(p for _, p in r) and any(not p for _, p in r)),
)
@_slow
def test_rank_auc_matches_brute_force(spark, rows):
    """2U from the histogram-shaped rank_auc must equal the O(n²)
    definition: Σ over (pos, neg) pairs of 2·[s_p > s_n] + 1·[s_p = s_n]."""
    from mapreduce_big_data_processing_spark.operators import ml as ML

    df = spark.createDataFrame(
        [(s, "pos" if p else "neg") for s, p in rows], "score long, label string"
    )
    got = ML.rank_auc(df, "score", "label", "pos").collect()[0]
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    u2 = sum(2 * (a > b) + (a == b) for a in pos for b in neg)
    assert got.auc_num_2u == u2
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))


@given(
    evs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.sampled_from("abc")),
        min_size=1,
        max_size=30,
    ),
)
@_slow
def test_status_intervals_match_python_model(spark, evs):
    """Run segmentation must match itertools.groupby over the per-key
    (ts, event_id)-sorted stream; valid_to chains to the next run's start."""
    import itertools

    from mapreduce_big_data_processing_spark.operators import temporal as TP

    df = spark.createDataFrame(
        [(u, t, i, s) for i, (u, t, s) in enumerate(evs)],
        "user_id long, ts long, event_id long, event_type string",
    )
    got = sorted(
        (
            (r.user_id, r.valid_from, r.valid_to, r.event_type, r.n_events)
            for r in TP.status_intervals(df).collect()
        ),
        key=repr,  # total order despite NULL valid_to on open runs
    )
    want = []
    bykey = {}
    for i, (u, t, s) in enumerate(evs):
        bykey.setdefault(u, []).append((t, i, s))
    for u, rows_ in bykey.items():
        rows_.sort()
        runs = [
            (grp[0][0], [g for g in grp])
            for grp in (list(g) for _, g in itertools.groupby(rows_, key=lambda r: r[2]))
        ]
        for j, (start, members) in enumerate(runs):
            nxt = runs[j + 1][0] if j + 1 < len(runs) else None
            want.append((u, start, nxt, members[0][2], len(members)))
    assert got == sorted(want, key=repr)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=60),
    st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=60),
    st.sampled_from([1 << 2, 1 << 6]),
)
@pytest.mark.slow
def test_bloom_semi_join_equals_plain_semi_join(spark, big_keys, small_keys, blocks):
    """Bloom pruning is exact for ANY filter sizing: an undersized (noisy)
    filter only passes more rows to the exact join, never drops a match.
    Tiny block counts force heavy block collisions; full-range int64 keys
    exercise the whole hash domain."""
    from mapreduce_big_data_processing_spark.operators import bloom as B

    big = spark.createDataFrame([(k, i) for i, k in enumerate(big_keys)], "k long, v long")
    small = spark.createDataFrame([(k,) for k in small_keys], "k long")
    got = sorted(map(tuple, B.bloom_semi_join(big, small, "k", num_blocks=blocks).collect()))
    want = sorted(map(tuple, big.join(small.distinct(), "k", "left_semi").collect()))
    assert got == want


@given(docs=DOCS, split=st.integers(min_value=0, max_value=7))
@_slow
@pytest.mark.slow
def test_incremental_dedup_consistent_with_exact_dedup(spark, docs, split):
    """Incremental classification must agree with batch-wide exact dedup
    of the union: a new doc is dup_of_history iff its fingerprint occurs
    in the history slice; among the rest, exactly one keeper per
    fingerprint (the min id), everything else dup_in_batch."""
    df = _mkdocs(spark, docs)
    hist_docs = df.filter(F.col("doc_id") < split)
    new_docs = df.filter(F.col("doc_id") >= split)
    if new_docs.rdd.isEmpty():
        return
    hist = hist_docs.select(
        D.content_fingerprint(F.col("text")).alias("fingerprint")
    )
    got = D.incremental_dedup(new_docs, hist).collect()
    # python model
    import hashlib

    def canon_fp(t):
        return hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()

    hist_fps = {canon_fp(t) for _, t in hist_docs.select("doc_id", "text").collect()}
    new_rows = sorted((r["doc_id"], canon_fp(r["text"])) for r in new_docs.collect())
    keeper: dict = {}
    expect = {}
    for i, fp in new_rows:
        if fp in hist_fps:
            expect[i] = "dup_of_history"
        elif fp in keeper:
            expect[i] = "dup_in_batch"
        else:
            keeper[fp] = i
            expect[i] = "kept"
    assert {r["doc_id"]: r["status"] for r in got} == expect


@given(docs=DOCS)
@_slow
def test_ngram_diversity_matches_python_model(spark, docs):
    """Trigram types/tokens/singletons equal a direct Python count, and
    the operator is partition-invariant."""
    from collections import Counter

    df = _mkdocs(spark, docs).withColumn(
        "source", (F.col("doc_id") % 2).cast("string")
    )
    from mapreduce_big_data_processing_spark.operators import textstats as TS

    got = {
        r["source"]: (
            r["distinct_ngrams"], r["total_ngrams"], r["singleton_ngrams"]
        )
        for r in TS.ngram_diversity(df.repartition(5), n=3).collect()
    }
    model: dict = {}
    for i, ws in enumerate(docs):
        src = str(i % 2)
        c = model.setdefault(src, Counter())
        for j in range(len(ws) - 2):
            c[tuple(ws[j : j + 3])] += 1
    expect = {
        s: (len(c), sum(c.values()), sum(1 for v in c.values() if v == 1))
        for s, c in model.items()
        if c
    }
    assert got == expect


def test_prefix_filter_is_lossless(spark):
    """PPJoin pigeonhole property: the prefix-filtered exact Jaccard join
    returns EXACTLY the pairs the naive all-pairs join returns, on a
    corpus engineered with heavy shared head tokens (where a lossy filter
    would show) and verified against a pure-Python model."""
    from itertools import combinations

    from mapreduce_big_data_processing_spark.operators import dedup as D

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        "a completely different document about spark shuffles",
        "a completely different document about spark joins",
        "the the the the the the the the",
        "short one",
        "short two",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sh = D.shingles(docs, k=3)
    got = {
        (r["id_a"], r["id_b"], r["inter"], r["union_sz"])
        for r in D.prefix_filtered_jaccard_pairs(sh, t_num=1, t_den=3).collect()
    }

    py_sets = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in sh.collect():
        py_sets[r["doc_id"]].add(r["shingle"])
    want = set()
    for a, b in combinations(sorted(py_sets), 2):
        sa, sb = py_sets[a], py_sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if 3 * inter >= 1 * union:
            want.add((a, b, inter, union))
    assert got == want


def test_exact_order_statistics_matches_sorted_model(spark):
    """Distributed selection == value at rank in the fully sorted multiset,
    including heavy ties, n < bins, and a degenerate constant column."""
    from mapreduce_big_data_processing_spark.operators import relational as R

    vals = [5.0, 1.0, 3.0, 3.0, 3.0, 9.0, 2.0, 3.0, 7.0, 1.0, 8.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    fr = (0.25, 0.5, 0.75)
    got = {
        r["rank"]: r["value"]
        for r in R.exact_order_statistics(df, "value", fr, bins=4).collect()
    }
    sv = sorted(vals)
    want = {max(int(len(vals) * f), 1): sv[max(int(len(vals) * f), 1) - 1] for f in fr}
    assert got == want

    const = spark.createDataFrame([(2.5,)] * 6, "value double")
    got_c = {
        r["rank"]: r["value"]
        for r in R.exact_order_statistics(const, "value", fr, bins=8).collect()
    }
    assert got_c == {1: 2.5, 3: 2.5, 4: 2.5}


# ---------------------------------------------------------------------------
# snapshot-ledger time travel: as-of reads equal a sequential fold model
# ---------------------------------------------------------------------------

MUTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.sampled_from(["put", "delete"]),
    ),
    min_size=1,
    max_size=12,
)


@given(muts=MUTS, n_batches=st.integers(min_value=1, max_value=4))
@_slow
def test_time_travel_matches_sequential_fold_model(spark, muts, n_batches):
    """For ANY mutation sequence and ANY batch split, the as-of-batch-b
    read of the retain_history table equals a plain sequential fold of
    batches <= b (latest version wins; tombstones mask). Versions are
    the mutation's global index, so every (key, version) is unique and
    the model has no tie ambiguity (tie semantics are pinned separately
    in test_upsert.py)."""
    import shutil
    import tempfile

    from mapreduce_big_data_processing_spark.streaming.sinks import (
        _keyed_upsert_apply_batch,
        _snapshot_name,
        commit_history_manifest,
        read_keyed_table,
    )

    schema = "k bigint, version bigint, v string, op string"
    rows = [
        (k, i, None if op == "delete" else f"v{i}", op)
        for i, (k, op) in enumerate(muts)
    ]
    # split into n_batches contiguous slices (some possibly empty)
    size = (len(rows) + n_batches - 1) // n_batches
    batches = [rows[i * size : (i + 1) * size] for i in range(n_batches)]

    wd = tempfile.mkdtemp(prefix="tt_prop_")
    try:
        empty = spark.createDataFrame([], schema)
        seed = _snapshot_name(-1)
        empty.write.mode("overwrite").parquet(f"{wd}/{seed}")
        commit_history_manifest(wd, [[-1, seed]], -1, 10)
        model: dict = {}
        expected_at = []
        for bid, batch in enumerate(batches):
            bdf = spark.createDataFrame(batch, schema)
            _keyed_upsert_apply_batch(
                bdf,
                bid,
                work_dir=wd,
                gens=None,
                schema=spark.createDataFrame([], schema).schema,
                key_cols=["k"],
                version_col="version",
                op_col="op",
                retain_history=10,
            )
            for k, ver, v, op in batch:
                cur = model.get(k)
                if cur is None or ver > cur[0]:
                    model[k] = (ver, v, op)
            expected_at.append(
                sorted(
                    (k, ver, v)
                    for k, (ver, v, op) in model.items()
                    if op == "put"
                )
            )
        for bid, expected in enumerate(expected_at):
            got = sorted(
                (r.k, r.version, r.v)
                for r in read_keyed_table(
                    spark, wd, schema, as_of_batch=bid
                ).collect()
            )
            assert got == expected, f"as_of={bid}"
    finally:
        shutil.rmtree(wd, ignore_errors=True)


@given(
    chars=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=40
    ),
    parts=st.sampled_from([1, 3, 8]),
)
@_slow
def test_global_rank_partition_invariance(spark, chars, parts):
    """global_rank must equal the single-window row_number for ANY data
    and ANY partition count — the rank is boundary-independent even
    though the range partitioning is sample-derived. Ties on the value
    are broken by the unique id, so the order is total."""
    from mapreduce_big_data_processing_spark.operators import relational as R

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chars)], "id long, val long"
    )
    got = sorted(
        (r.id, r.rnk)
        for r in R.global_rank(
            df, [F.desc("val"), F.asc("id")], num_partitions=parts
        ).collect()
    )
    expected_order = sorted(enumerate(chars), key=lambda t: (-t[1], t[0]))
    expected = sorted((i, pos + 1) for pos, (i, _c) in enumerate(expected_order))
    assert got == expected


def test_global_rank_rejects_column_collisions(spark):
    from mapreduce_big_data_processing_spark.operators import relational as R

    df = spark.createDataFrame([(1, 2)], "id long, rnk long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already carries"):
        R.global_rank(df, [F.asc("id")])
