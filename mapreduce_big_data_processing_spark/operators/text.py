"""Text operators (SURVEY.md §2 P3, A1, A5-A7, A9-A14).

The reference's text stack: tokenization with punctuation stripping and
stopword removal (`…/TF_IDF_Compute.java:79-99`,
`…/final_NB_src/phase1/Count/CountMapper.java:57-76`), word count
(`ppt/Ch2….pdf p.17-20`), co-occurrence pairs/stripes (`ppt/Ch5….pdf
p.43-48`, `ppt/Ch7….pdf p.8-10`), inverted index with payloads
(`ppt/Ch5….pdf p.52-65`), and the 5-job TF-IDF vectorization pipeline
(`…/TF_IDF_Compute.java`). Everything here is explode/groupBy/window
built-ins — the whole TF-IDF pipeline is one lazy plan instead of five
HDFS-materialized jobs.

At 100 TB: token explosion multiplies rows ~100×, but stays pipelined in
codegen (no shuffle until the groupBy); the per-doc TF window and the
doc-frequency aggregate are each a single shuffle on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tokens: lowercase, split on anything non-alphanumeric (the reference
#: replaces a punctuation list then splits on whitespace,
#: `…/TF_IDF_Compute.java:79-99`)
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out: str = "word",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """P3 — lowercase → split → explode; empty tokens dropped (the
    reference's `word.isEmpty()` guard, `…/Count/CountMapper.java:71`)."""
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
    return (
        df.select(*keep, F.explode(words).alias(out))
        .filter(F.col(out) != "")
    )


def tokenize_cjk(
    df: DataFrame,
    dictionary: list[str],
    text_col: str = "text",
    out: str = "word",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """P3 CJK variant — dictionary-aware segmentation (project 2 requires
    segmenting Jin Yong novels with a user dictionary of character names,
    `…课程设计2-金庸的江湖.pdf p.6-7`, Ansj in the reference).

    Greedy forward maximal matching against the broadcast dictionary in an
    Arrow-batched pandas UDF (per-char lookahead is inherently procedural —
    the documented escape hatch, SURVEY §4). Non-dictionary runs fall back
    to the standard tokenizer's alphanumeric splitting; other CJK chars
    outside the dictionary are dropped (the reference keeps only dictionary
    names for the co-occurrence graph).
    """
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {w: None for w in sorted(dictionary, key=len, reverse=True)}
    )
    max_len = max((len(w) for w in dictionary), default=1)

    def segment(batches):
        import pandas as pd
        import re

        words = bc.value
        ascii_re = re.compile(r"[a-z0-9]+")

        def seg_one(text: str) -> list[str]:
            out_words = []
            i, n = 0, len(text)
            while i < n:
                matched = None
                for l in range(min(max_len, n - i), 0, -1):
                    cand = text[i : i + l]
                    if cand in words:
                        matched = cand
                        break
                if matched:
                    out_words.append(matched)
                    i += len(matched)
                elif text[i].isascii():
                    m = ascii_re.match(text.lower(), i)
                    if m:
                        out_words.append(m.group(0))
                        i = m.end()
                    else:
                        i += 1
                else:
                    i += 1
            return out_words

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for w in seg_one(row[text_col] or ""):
                    rows.append({**{c: row[c] for c in keep}, out: w})
            yield pd.DataFrame(rows, columns=[*keep, out]) if rows else pd.DataFrame(
                {c: [] for c in [*keep, out]}
            )

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep] + [f"{out} string"]
    )
    return df.mapInPandas(segment, schema=schema)


def remove_stopwords(tokens: DataFrame, stopwords: DataFrame, word_col: str = "word") -> DataFrame:
    """P2 — stopword removal as a broadcast anti-join (the reference loads
    the list from the distributed cache into each mapper,
    `…/Count/CountMapper.java:28-45`)."""
    sw = stopwords.toDF("__sw")
    return tokens.join(F.broadcast(sw), tokens[word_col] == sw["__sw"], "left_anti")


def word_count(tokens: DataFrame, word_col: str = "word", out: str = "cnt") -> DataFrame:
    """A1 — the canonical WordCount (`ppt/Ch2….pdf p.17-20`)."""
    return tokens.groupBy(word_col).agg(F.count(F.lit(1)).alias(out))


def doc_frequency(
    tokens: DataFrame, doc_col: str = "doc_id", word_col: str = "word", out: str = "df"
) -> DataFrame:
    """A6 — number of documents containing each term
    (`…/final_NB_src/phase1/ListWords/*`, `…/TF_IDF_Compute.java:198-236`)."""
    return tokens.groupBy(word_col).agg(F.countDistinct(doc_col).alias(out))


def term_frequency(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    word_col: str = "word",
    out: str = "tf",
    normalized: bool = True,
) -> DataFrame:
    """A5 — per-(doc,term) count, normalized by doc length. The reference
    delivers the doc length via a `!` sentinel record that sorts first
    (`…/TF_IDF_Compute.java:103-131`); a window total replaces it."""
    counts = tokens.groupBy(doc_col, word_col).agg(F.count(F.lit(1)).alias("cnt"))
    if not normalized:
        return counts.withColumnRenamed("cnt", out)
    w = Window.partitionBy(doc_col)
    return counts.withColumn(out, F.col("cnt") / F.sum("cnt").over(w)).drop("cnt")


def tf_idf(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    word_col: str = "word",
    reference_semantics: bool = False,
) -> DataFrame:
    """A5-A7 — TF-IDF weights per (doc, term).

    ``reference_semantics=True`` reproduces the reference's quirk of using
    plain N/df with **no logarithm** (`…/TF_IDF_Compute.java:232`); default
    is the standard log(N/df).
    Output: (doc, word, tf, idf, tfidf).
    """
    # One (doc,word) aggregation feeds tf, df and N. CACHED: column pruning
    # specializes each consumer's aggregate (df doesn't need cnt, N only
    # needs doc), so the three subplans are NOT identical and ReuseExchange
    # cannot deduplicate them — without the cache the tokenize scan +
    # explode runs three times (verified in the physical plan). The cached
    # table is (doc × distinct-word) rows — far smaller than the token
    # stream it replaces.
    counts = (
        tokens.groupBy(doc_col, word_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    w = Window.partitionBy(doc_col)
    tf = counts.withColumn("tf", F.col("cnt") / F.sum("cnt").over(w)).drop("cnt")
    dfreq = counts.groupBy(word_col).agg(F.count(F.lit(1)).alias("df"))
    # N as a lazy broadcast scalar (single plan, no driver-side action)
    n_docs = counts.select(doc_col).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    idf = F.col("__n") / F.col("df")
    if not reference_semantics:
        idf = F.log(idf)
    weights = dfreq.crossJoin(F.broadcast(n_docs)).withColumn("idf", idf).drop("df", "__n")
    return (
        # vocabulary ≪ corpus (Zipf): broadcast the per-word weights so the
        # (doc,word) side never re-shuffles on word — post-aggregation stats
        # are unknown to the planner, so without the hint (and with AQE off)
        # this becomes a sort-merge join
        tf.join(F.broadcast(weights), word_col)
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
        .select(doc_col, word_col, "tf", "idf", "tfidf")
    )


def sparse_vectors(
    tfidf: DataFrame, doc_col: str = "doc_id", word_col: str = "word", weight_col: str = "tfidf"
) -> DataFrame:
    """A7 — assemble per-doc sparse vectors. The reference encodes
    `label\\tidx:val idx:val…` strings (`…/TF_IDF_Compute.java:346-400`);
    here the vector is a typed array<struct<idx,val>> with the vocabulary
    index assigned by row_number over the sorted vocab."""
    vocab = (
        tfidf.select(word_col)
        .distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy(word_col)) - 1)
    )
    return (
        tfidf.join(vocab, word_col)
        .groupBy(doc_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("idx"), F.col(weight_col).alias("val")))
            ).alias("vector")
        )
    )


def cooccurrence_pairs(
    unit_words: DataFrame,
    unit_col: str = "doc_id",
    word_col: str = "word",
    out: str = "cnt",
    symmetric: bool = True,
) -> DataFrame:
    """A12 — co-occurrence counts within a unit (paragraph/doc), the
    project-2 person-pair shape (`…课程设计2….pdf p.3`, `ppt/Ch5….pdf
    p.43-48`). Counts each unordered pair once per unit (presence-based,
    as in the worked example); ``symmetric=False`` keeps w1 < w2 only.

    Implementation: distinct (unit, word) self-join on unit. The reference's
    "pairs vs stripes" distinction (`ppt/Ch7….pdf p.8-10`) is moot — partial
    hash aggregation gives stripes' map-side compaction automatically. (An
    array-based formulation — collect_set per unit + JVM-side pair
    generation — was benchmarked and lost to the join: nested lambda
    codegen outweighs the avoided shuffle at every tested scale.)
    """
    a = unit_words.select(F.col(unit_col).alias("u"), F.col(word_col).alias("w1")).distinct()
    b = unit_words.select(F.col(unit_col).alias("u"), F.col(word_col).alias("w2")).distinct()
    cond = F.col("w1") < F.col("w2") if not symmetric else F.col("w1") != F.col("w2")
    return (
        a.join(b, "u")
        .filter(cond)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias(out))
    )


def cooccurrence_window_pairs(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    out: str = "cnt",
) -> DataFrame:
    """A12 window-k variant — neighbors within ``window`` positions
    (`ppt/Ch5….pdf p.44-48` uses window 2 over the token sequence).
    Ordered pairs (wi, wj) for j in (i, i+window]."""
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
    toks = docs.select(
        F.col(doc_col).alias("u"), F.posexplode(words).alias("pos", "w")
    ).filter(F.col("w") != "")
    a = toks.select("u", F.col("pos").alias("p1"), F.col("w").alias("w1"))
    b = toks.select("u", F.col("pos").alias("p2"), F.col("w").alias("w2"))
    return (
        a.join(b, "u")
        .filter((F.col("p2") > F.col("p1")) & (F.col("p2") <= F.col("p1") + window))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias(out))
    )


def pmi_pairs(
    unit_words: DataFrame,
    unit_col: str = "doc_id",
    word_col: str = "word",
    min_pair_count: int = 2,
) -> DataFrame:
    """Collocation mining: the exact-integer sufficient statistics of
    pointwise mutual information for presence-based word pairs —
    PMI(a,b) = ln(pair_cnt · n_units / (df_a · df_b)). Extends A12's
    co-occurrence counts (`ppt/Ch5….pdf p.43-48`) with the normalization a
    phrase-mining / collocation pass over a training corpus needs.

    Emits the integers (pair_cnt, df1, df2, n_units) instead of the log:
    consumers rank by the exact rational pair_cnt·n_units/(df1·df2)
    (cross-multiplication, no floats), and the output stays hash-exact
    across engines — the zero-float protocol.

    Shuffle inventory: the distinct (unit, word) projection feeds three
    branches (pair self-join twice, df once) — AQE's exchange reuse
    collapses the identical scans at runtime; pair groupBy and df groupBy
    each shuffle once more; the two word joins broadcast the df table when
    small (plan-asserted) and fall back to hash joins at scale.
    ``min_pair_count`` prunes the hapax tail before the word joins.
    """
    uw = unit_words.select(
        F.col(unit_col).alias("u"), F.col(word_col).alias("w")
    ).distinct()
    pairs = (
        uw.select("u", F.col("w").alias("w1"))
        .join(uw.select("u", F.col("w").alias("w2")), "u")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_count)
    )
    dfreq = uw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_units = uw.agg(F.countDistinct("u").alias("n_units"))
    return (
        pairs.join(dfreq.select(F.col("w").alias("w1"), F.col("df").alias("df1")), "w1")
        .join(dfreq.select(F.col("w").alias("w2"), F.col("df").alias("df2")), "w2")
        .crossJoin(n_units)
        .select("w1", "w2", "pair_cnt", "df1", "df2", "n_units")
    )


def inverted_index(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    word_col: str = "word",
    with_tf: bool = True,
) -> DataFrame:
    """A9/A10 — term → postings sorted by doc, with tf payloads. The
    reference shifts posting-sort into the shuffle via composite keys +
    custom partitioner (`ppt/Ch5….pdf p.56-65`, `ppt/Ch7….pdf p.4-7`);
    sort_array(collect_list) is equivalent and shuffle-neutral."""
    if with_tf:
        per_doc = tokens.groupBy(word_col, doc_col).agg(F.count(F.lit(1)).alias("tf"))
        postings = F.sort_array(F.collect_list(F.struct(doc_col, "tf")))
        return per_doc.groupBy(word_col).agg(
            postings.alias("postings"),
            (F.sum("tf") / F.countDistinct(doc_col)).alias("avg_tf_per_doc"),
        )
    postings = F.sort_array(F.collect_set(doc_col))
    return tokens.groupBy(word_col).agg(postings.alias("postings"))


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a bag of query terms — the
    scoring layer over the inverted index (A9-A10): the reference builds
    postings lists (`ppt/Ch5….pdf p.52-65`); BM25 is what a search engine
    computes FROM them. Lucene-style idf = ln(1 + (N - df + .5)/(df + .5))
    (always positive).

    Plan shape: ONE tokenize scan → ONE groupBy(id) computing dl and every
    per-term tf as conditional sums in the same pass (the query-term list
    is a compile-time literal, so tf columns are CASE sums — no second
    aggregation, no tf⋈dl join). The per-term unpivot and the final
    per-doc sum stay partitioned on id, so the whole query is a single
    data-sized exchange; df and (N, avgdl) reduce the per-doc table to
    broadcast scalars. Output: (id, bm25) for docs matching ≥1 term.
    """
    toks = tokenize(docs.select(id_col, text_col), text_col, out="w")
    # cache: stats, df, and the scoring branch all read this — without it
    # each branch re-runs the tokenize scan + aggregation (column pruning
    # makes the three exchanges non-identical, so ReuseExchange can't
    # help). One row per doc: orders of magnitude smaller than the corpus.
    per_doc = toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("w") == t).cast("bigint")).alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    ).cache()
    stats = per_doc.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    stack_args = ", ".join(
        f"'{t}', _tf{i}" for i, t in enumerate(query_terms)
    )
    tf = per_doc.select(
        id_col,
        "dl",
        F.expr(f"stack({len(query_terms)}, {stack_args}) AS (w, tf)"),
    ).filter(F.col("tf") > 0)
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_len = 1 - b + b * F.col("dl") / F.col("avgdl")
    per_term = idf * (
        F.col("tf") * (k1 + 1) / (F.col("tf") + k1 * norm_len)
    )
    return (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), per_term.alias("sc"))
        .groupBy(id_col)
        .agg(F.round(F.sum("sc"), 6).alias("bm25"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """Distributed BPE vocabulary induction (Sennrich et al. ACL'16) — the
    tokenizer-training step of an LLM data pipeline, in its standard
    scalable shape: ONE corpus-sized pass builds the (word, freq) table,
    then every merge step runs on that vocab-sized table (Zipf-bounded,
    MBs at 100 TB — this is how production tokenizer trainers scale, the
    corpus is never re-scanned).

    Per step: adjacent symbol-pair counts weighted by word frequency (one
    grouped aggregate), deterministic argmax (count DESC, then lexicographic
    pair — ties never depend on partitioning), then the pair is merged
    leftmost-non-overlapping in every word (an Arrow stage; the scan rule
    equals the run-parity rule the SQL oracle uses, and only matters for
    self-pairs like 'a a' — overlapping matches require left==right).
    `localCheckpoint` per step keeps the 2·n_merges-job lineage flat.
    Driver state is one (pair, count) row per step — model-sized.

    Output: (step, lhs, rhs, merged, pair_count) — the learned merge table.
    Raises if the corpus exhausts mergeable pairs before ``n_merges``.
    """
    from pyspark.sql import types as T

    toks = tokenize(docs.select(text_col), text_col, out="word")
    wf = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    seqs = wf.select(
        "freq", F.filter(F.split("word", "(?!^)"), lambda x: x != "").alias("s")
    ).localCheckpoint()
    seq_schema = T.StructType(
        [
            T.StructField("freq", T.LongType()),
            T.StructField("s", T.ArrayType(T.StringType())),
        ]
    )
    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            seqs.filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at("s", i).alias("a"),
                            F.element_at("s", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        )
        best = pairs.first()
        if best is None:
            raise ValueError(f"bpe_train: pairs exhausted at step {step}")
        a, b, cnt = best.a, best.b, best.cnt
        merges.append((step, a, b, a + b, cnt))

        def merge(batches, a=a, b=b):
            import pandas as pd

            for pdf in batches:
                ns = []
                for s in pdf["s"]:
                    s = list(s)
                    o, i, n = [], 0, len(s)
                    while i < n:
                        if i + 1 < n and s[i] == a and s[i + 1] == b:
                            o.append(a + b)
                            i += 2
                        else:
                            o.append(s[i])
                            i += 1
                    ns.append(o)
                yield pd.DataFrame({"freq": pdf["freq"], "s": ns})

        seqs = seqs.mapInPandas(merge, schema=seq_schema).localCheckpoint()
    return docs.sparkSession.createDataFrame(
        merges,
        "step int, lhs string, rhs string, merged string, pair_count bigint",
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list: distinct corpus words → token arrays
    (word, freq, tokens). Applying the merges IN LEARNED ORDER to the char
    sequence reproduces the trainer's final symbol state exactly on the
    training corpus (training applied merge t once and never revisited it).
    One corpus pass for the word-freq table, then one Arrow stage over the
    vocab-sized table — the corpus is never re-scanned per merge."""
    from pyspark.sql import types as T

    toks = tokenize(docs.select(text_col), text_col, out="word")
    wf = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            toks_out = []
            for w in pdf["word"]:
                s = list(w)
                for a, b in merges:
                    o, i, n = [], 0, len(s)
                    while i < n:
                        if i + 1 < n and s[i] == a and s[i + 1] == b:
                            o.append(a + b)
                            i += 2
                        else:
                            o.append(s[i])
                            i += 1
                    s = o
                toks_out.append(s)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], "tokens": toks_out}
            )

    return wf.mapInPandas(seg, schema=out_schema)
