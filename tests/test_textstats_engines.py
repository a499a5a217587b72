"""Arrow-vs-expression parity for the multi-regex text stats.

quality_score/language_id default to one Arrow stage of precompiled
Python-ASCII regexes (see textstats._append_regex_counts for the measured
JVM multi-pattern JIT pathology that motivated it). These tests pin the
contract that made the switch safe: both engines produce IDENTICAL rows,
including on inputs chosen to expose regex-dialect drift — CJK word
chars, accented letters (non-word under both ASCII dialects), case,
digits, punctuation runs, empty and whitespace-only strings.
"""

from __future__ import annotations

import pytest

from mapreduce_big_data_processing_spark.operators import textstats as TS

ADVERSARIAL = [
    (0, "the cat and the hat, of course!"),
    (1, "UPPER CASE AND the lower"),
    (2, "汉字的测试 是 的 mixed with english the"),
    (3, "éàç accents are not ascii words the the"),
    (4, ""),
    (5, "   \t  "),
    (6, "!!! ??? ... ;;; %%% $$$"),
    (7, "der die und das ist ein test"),
    (8, "le la de et les des est une phrase"),
    (9, "a1b2c3 4d5e6f under_score-dash.dot"),
    (10, "word " * 50),
    # spaced: the marker heuristic needs word boundaries, and CJK chars
    # are word chars in _W, so a contiguous run has none (both engines)
    (11, "的 是 了 在 我 有 和 不"),
    (12, "的是了在我有和不"),
]


def _df(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id bigint, text string")


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_quality_score_engines_identical(spark):
    docs = _df(spark)
    arrow = TS.quality_score(docs, engine="arrow")
    expr = TS.quality_score(docs, engine="expr")
    assert arrow.columns == expr.columns
    assert _rows(arrow) == _rows(expr)


def test_language_id_engines_identical(spark):
    docs = _df(spark)
    arrow = TS.language_id(docs, engine="arrow")
    expr = TS.language_id(docs, engine="expr")
    assert arrow.columns == expr.columns
    assert _rows(arrow) == _rows(expr)


def test_language_id_detects_planted_languages(spark):
    docs = _df(spark)
    got = {r.doc_id: r.lang_pred for r in TS.language_id(docs).collect()}
    assert got[0] == "en" and got[7] == "de" and got[8] == "fr"
    assert got[11] == "zh" and got[12] == "und"
    assert got[4] == "und" and got[6] == "und"


def test_append_regex_counts_matches_regexp_count(spark):
    from pyspark.sql import functions as F

    docs = _df(spark)
    specs = {
        "c_words": (f"[{TS._W}]+", "lower"),
        "c_punct": (r"[^\w\s]", "text"),
        "c_stop": (TS._marker_pattern(TS.LANG_MARKERS["en"]), "lower"),
    }
    got = TS._append_regex_counts(docs, specs).select("doc_id", *specs)
    low = F.lower(F.col("text"))
    want = docs.select(
        "doc_id",
        F.regexp_count(low, F.lit(specs["c_words"][0])).alias("c_words"),
        F.regexp_count(F.col("text"), F.lit(specs["c_punct"][0])).alias("c_punct"),
        F.regexp_count(low, F.lit(specs["c_stop"][0])).alias("c_stop"),
    )
    assert _rows(got) == _rows(want)


# -- property-based dialect equivalence ----------------------------------
# The Arrow stage's whole safety argument is "Python re.ASCII counts ==
# Java regexp_count over our pattern family". The fixture cases above pin
# known hazards; this drives the same claim over generated text mixing
# every character class the patterns mention (ASCII words, digits,
# punctuation, whitespace, CJK, accented letters).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ALPHABET = st.sampled_from(
    list("abcXYZ019 _-.,!?;:'\"$%\t\n") + ["é", "ß", "的", "是", "汉", "и"]
)
_TEXTS = st.lists(
    st.text(_ALPHABET, min_size=0, max_size=40), min_size=1, max_size=6
)

_prop = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(texts=_TEXTS)
@_prop
@pytest.mark.slow
def test_append_regex_counts_dialect_equivalence(spark, texts):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    specs = {
        "c_words": (f"[{TS._W}]+", "lower"),
        "c_wchars": (f"[{TS._W}]", "lower"),
        "c_punct": (r"[^\w\s]", "text"),
        "c_stop": (TS._marker_pattern(TS.LANG_MARKERS["en"]), "lower"),
    }
    got = _rows(TS._append_regex_counts(docs, specs).select("doc_id", *specs))
    low = F.lower(F.col("text"))
    want = _rows(
        docs.select(
            "doc_id",
            *[
                F.regexp_count(low if src == "lower" else F.col("text"), F.lit(pat))
                .cast("int")
                .alias(name)
                for name, (pat, src) in specs.items()
            ],
        )
    )
    assert got == want


def test_repetition_scores_engines_identical(spark):
    """Arrow and expression engines must agree bit-for-bit on the fixture
    corpus — including the Decimal-HALF_UP rounding replication (the
    1/128 = 0.0078125-style values where banker's rounding would differ)."""
    import __spark_entry__  # noqa: F401  (path for catalog)
    from mapreduce_big_data_processing_spark import catalog

    docs = catalog.load(spark, "documents", "/root/testdata/sf0.001")
    edge = spark.createDataFrame(
        # 129 words => 128 2-grams: modal 1/128 = 0.0078125 exercises the
        # HALF_UP-vs-banker's boundary; plus empty-ish docs
        [(9001, " ".join(f"w{i}" for i in range(129))), (9002, ""), (9003, "  ")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(edge)
    arrow = TS.repetition_scores(both, engine="arrow")
    expr = TS.repetition_scores(both, engine="expr")
    assert arrow.columns == expr.columns
    assert _rows(arrow) == _rows(expr)


def test_repetition_scores_hand_worked(spark):
    """Hand-computed repetition metrics on constructed docs.

    doc 1: "a b a b a b" — n=6, 2 distinct words -> dup_word_frac = 4/6;
      5-grams: "a b a b a", "b a b a b" (2 distinct of 2) -> dup5 = 0;
      2-grams: [ab, ba, ab, ba, ab] -> modal "a b" x3 of 5 -> top2 = 0.6.
    doc 2: "x x x x x x" — 1 distinct word -> dupw = 5/6; both 5-grams
      identical -> dup5 = 0.5; modal 2-gram 5/5 -> top2 = 1.0.
    doc 3: "p q r s" — shorter than the 5-gram window -> dup5 = 0.0,
      all words and 2-grams unique -> dupw 0, top2 = 1/3.
    doc 4: "solo" — single word: no 2-grams at all -> top2 = 0.0.
    """
    from mapreduce_big_data_processing_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "x x x x x x"),
            (3, "p q r s"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.dup_5gram_frac, r.top_2gram_frac)
        for r in TS.repetition_scores(docs).collect()
    }
    assert got == {
        1: (6, round(4 / 6, 6), 0.0, 0.6),
        2: (6, round(5 / 6, 6), 0.5, 1.0),
        3: (4, 0.0, 0.0, round(1 / 3, 6)),
        4: (1, 0.0, 0.0, 0.0),
    }


def test_bigram_lm_semantics(spark):
    """Hand-checkable bigram LM: train split pinned by md5 arithmetic,
    p(w2|w1) = (c12+0.5)/(c1+0.5*(V+1)), docs with <2 tokens drop out."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b"),
            (3, "b a"),
            (4, "solo"),
            (5, "zz qq"),
        ],
        "doc_id long, text string",
    )
    out = TS.bigram_lm_cross_entropy(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3, 5}  # doc 4 has no bigram
    assert all(r.is_train in (0, 1) for r in out)
    # replicate the model in Python: recompute each doc's split flag with
    # the operator's own md5 arithmetic, then count train-split bigrams
    import hashlib

    def is_train(doc_id: int) -> bool:
        h = hashlib.md5(f"{doc_id}lm".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60) < 0.75

    c12: dict[tuple[str, str], int] = {}
    for i, text in {1: "a b a b", 2: "a b", 3: "b a", 4: "solo", 5: "zz qq"}.items():
        ws = text.split()
        if is_train(i):
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    vocab = set()
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        vocab.update((a, b))
    V = len(vocab)
    for r in out:
        assert r.is_train == int(is_train(r.doc_id))
        text = {1: "a b a b", 2: "a b", 3: "b a", 5: "zz qq"}[r.doc_id]
        ws = text.split()
        ce = sum(
            -math.log(
                (c12.get((a, b), 0) + 0.5) / (c1.get(a, 0) + 0.5 * (V + 1))
            )
            for a, b in zip(ws, ws[1:])
        ) / (len(ws) - 1)
        assert r.n_bigrams == len(ws) - 1
        assert abs(r.cross_entropy - round(ce, 6)) < 1e-9, (r, ce)


def test_bigram_lm_oracle_rounding_margin():
    """bigram_lm_cross_entropy hashes per-doc avg(-ln p) rounded at 6
    decimals. The min distance-to-round-half over D docs is a uniform
    lottery (~0.5e-6/D — measured 6.5e-10 at the gate SF's ~500 docs,
    exactly the expectation); what must NEVER happen is a margin at the
    summation-noise scale (~1e-13 absolute for these ~7-magnitude avgs
    of ~100 terms). Assert >=2e-11 (100x above worst-case noise) at the
    gate SF, and that both split classes are populated."""
    import duckdb

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["bigram_lm_cross_entropy"]
    unrounded = sql.replace("round(avg(", "avg(").replace(", 6) AS cross_entropy",
                                                          " AS cross_entropy")
    assert unrounded != sql
    con = duckdb.connect()
    for t in "documents".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    rows = con.sql(unrounded).fetchall()
    assert len(rows) > 100
    assert {r[1] for r in rows} == {0, 1}
    worst = min(abs((r[3] * 1e6) % 1 - 0.5) for r in rows)
    assert worst * 1e-6 > 2e-11, f"rounding margin too small: {worst * 1e-6}"


def test_distinctive_terms_hand_worked(spark):
    """Planted keyness: 'zebra' is concentrated in group g1; common words
    are uniform. Verify the integer lift flag against hand arithmetic."""
    rows = [
        ("g1", "zebra zebra zebra zebra zebra common common"),
        ("g1", "zebra zebra zebra common common common"),
        ("g2", "common common common common common common"),
        ("g2", "common common common common common common common"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = TS.distinctive_terms(
        df, group_col="source", lift_num=2, lift_den=1, min_count=5
    )
    got = {(r["source"], r["word"]): r for r in out.collect()}
    # zebra in g1: a=8, s=13 group tokens, t=8 corpus, T=26 total
    # lift = (8/13)/(8/26) = 2.0 >= 2 -> flagged, support 8 >= 5
    assert ("g1", "zebra") in got
    z = got[("g1", "zebra")]
    assert (
        z["term_count"],
        z["corpus_count"],
        z["group_tokens"],
        z["total_tokens"],
    ) == (8, 8, 13, 26)
    # common in g2: lift = (13/13)/(18/26) = 1.44 < 2 -> not flagged
    assert ("g2", "common") not in got
    assert len(got) == 1


def test_ngram_diversity_hand_worked(spark):
    """Trigram types/tokens/singletons on a planted templated group:
    g_tmpl repeats one trigram; g_div has all-distinct trigrams."""
    rows = [
        ("g_tmpl", "a b c a b c a b c"),  # 7 trigrams: abc x3, bca x2, cab x2
        ("g_div", "p q r s t"),  # 3 trigrams, all singletons
        ("g_div", "x y"),  # too short -> contributes nothing
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in TS.ngram_diversity(df, n=3).collect()}
    t = out["g_tmpl"]
    assert (
        t["distinct_ngrams"],
        t["total_ngrams"],
        t["singleton_ngrams"],
    ) == (3, 7, 0)
    d = out["g_div"]
    assert (
        d["distinct_ngrams"],
        d["total_ngrams"],
        d["singleton_ngrams"],
    ) == (3, 3, 3)
    assert len(out) == 2


def _lid_ngram_reference(text: str) -> tuple[str, int]:
    """Pure-Python model of the char-n-gram LID: per language, count text
    positions whose n-gram is in the profile; argmax, ties to the
    alphabetically first language, 'und' on zero hits."""
    low = text.lower()
    best_lang, best_hits = "und", 0
    for lang, (n, grams) in sorted(TS._lid_ngram_profiles().items()):
        gs = set(grams)
        hits = sum(1 for i in range(max(len(low) - n + 1, 0)) if low[i : i + n] in gs)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits


def test_language_id_ngram_matches_positional_reference(spark):
    docs = _df(spark)
    got = {
        r.doc_id: (r.lang_pred, r.top_hits)
        for r in TS.language_id_ngram(docs).collect()
    }
    for doc_id, text in ADVERSARIAL:
        assert got[doc_id] == _lid_ngram_reference(text), (doc_id, text)


def test_language_id_ngram_overlapping_and_cjk():
    # self-overlapping occurrences all count (the zero-width-lookahead
    # contract): " a a a " has " a " starting at positions 0, 2 and 4
    assert _lid_ngram_reference(" a a a ")[1] >= 3
    # contiguous CJK text hits the zh unigram profile (the word-marker
    # heuristic's blind spot the n-gram variant exists to cover)
    lang, hits = _lid_ngram_reference("的是了在我有和不")
    assert lang == "zh" and hits == 8


def test_language_id_ngram_spark_matches_reference_on_overlaps(spark):
    rows = [(0, " a a a "), (1, "的是了在我有和不"), (2, "dedededed the")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.lang_pred, r.top_hits)
        for r in TS.language_id_ngram(docs).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _lid_ngram_reference(text), (doc_id, text)
