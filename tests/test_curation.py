"""Curation operators: chunk dedup, decontamination, splits, quantization."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_big_data_processing_spark.operators import curation as C
from mapreduce_big_data_processing_spark.operators import dedup as D
from mapreduce_big_data_processing_spark.operators import quantization as QZ
from mapreduce_big_data_processing_spark.operators import similarity as S


@pytest.mark.slow
def test_chunk_dedup_paragraphs_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared passage here\n\ngamma"),
            (2, "shared passage here\n\ndelta epsilon"),
            (3, "shared passage here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in C.chunk_dedup(docs, paragraph_regex=r"\n{2,}").collect()
    }
    # doc 1 owns the first occurrence (lowest doc_id)
    assert out[1]["text_kept"] == "alpha beta shared passage here gamma"
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text_kept"] == "delta epsilon"
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    # doc 3 is entirely duplicate passages
    assert out[3]["text_kept"] == ""
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (1, 0)


def test_split_chunks_word_windows(spark):
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "  "), (3, "only")],
        "doc_id long, text string",
    )
    rows = sorted(
        C.split_chunks(docs, words_per_chunk=2).collect(),
        key=lambda r: (r["doc_id"], r["pos"]),
    )
    got = [(r["doc_id"], r["pos"], r["chunk"]) for r in rows]
    assert got == [
        (1, 1, "w1 w2"),
        (1, 2, "w3 w4"),
        (1, 3, "w5"),
        (3, 1, "only"),
    ]


@pytest.mark.slow
def test_contamination_and_decontaminate_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # contains bench 3-grams
            (2, "totally unrelated words entirely different"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id long, text string"
    )
    cont = C.ngram_contamination(D.shingles(docs, k=3), D.shingles(bench, k=3))
    by_id = {r["doc_id"]: r for r in cont.collect()}
    # doc 1: shingles {the quick brown, quick brown fox, brown fox jumps};
    # bench has the first two → 2/3
    assert by_id[1]["n_shingles"] == 3 and by_id[1]["n_matched"] == 2
    assert by_id[1]["contamination"] == pytest.approx(2 / 3, abs=1e-6)
    assert by_id[2]["n_matched"] == 0
    clean = C.decontaminate(docs, cont, max_contamination=0.5)
    assert [r["doc_id"] for r in clean.collect()] == [2]


def test_stratified_split_properties(spark):
    docs = spark.range(0, 400).withColumnRenamed("id", "k")
    w = {"train": 0.75, "val": 0.125, "test": 0.125}
    a = C.stratified_split(docs, "k", w)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # complete partition, roughly proportional
    assert sum(counts.values()) == 400
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: re-evaluation identical
    b = C.stratified_split(docs, "k", w)
    assert a.exceptAll(b).count() == 0
    # stable under growth: the first 100 keys keep their assignment
    sub = C.stratified_split(docs.filter(F.col("k") < 100), "k", w)
    joined = (
        a.filter(F.col("k") < 100)
        .withColumnRenamed("split", "s1")
        .join(sub.withColumnRenamed("split", "s2"), "k")
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0
    # salt changes assignments (different hash stream)
    salted = C.stratified_split(docs, "k", w, salt="v2")
    assert a.exceptAll(salted).count() > 0


def test_quantization_bounds(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = QZ.quantize(emb)
    stats = q.select(
        F.array_max("codes").alias("mx"),
        F.array_min("codes").alias("mn"),
        (
            F.array_max(
                F.zip_with(
                    QZ.dequantize(F.col("codes"), F.col("scale")),
                    F.transform(F.col("embedding"), lambda x: x.cast("double")),
                    lambda r, o: F.abs(r - o),
                )
            )
            <= F.col("scale") / 2 + F.lit(1e-12)
        ).alias("bounded"),
    ).collect()
    assert all(-127 <= r["mn"] and r["mx"] <= 127 for r in stats)
    assert all(r["bounded"] for r in stats)


def _toy_codebook(spark):
    # m=2 subspaces, k=3 centroids, dsub=2
    rows = [
        (0, 0, [1.0, 0.0]),
        (0, 1, [0.0, 1.0]),
        (0, 2, [1.0, 1.0]),
        (1, 0, [2.0, 0.0]),
        (1, 1, [0.0, 2.0]),
        (1, 2, [2.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "sub int, cid int, c array<double>")


def test_pq_encode_recovers_codes(spark):
    cb = _toy_codebook(spark)
    # vectors = exact centroid concatenations
    vecs = [
        (0, [1.0, 0.0, 2.0, 0.0], [0, 0]),
        (1, [0.0, 1.0, 0.0, 2.0], [1, 1]),
        (2, [1.0, 1.0, 2.0, 2.0], [2, 2]),
        (3, [0.0, 1.0, 2.0, 0.0], [1, 0]),
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in vecs], "vec_id long, embedding array<float>"
    )
    from mapreduce_big_data_processing_spark.operators.quantization import pq_encode

    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb, m=2).collect()}
    assert got == {i: c for i, _, c in vecs}


def test_pq_exact_on_codebook_vectors(spark):
    """When every corpus vector IS a centroid concatenation, PQ
    reconstruction is exact, so ADC top-k must equal brute-force top-k."""
    import itertools

    from mapreduce_big_data_processing_spark.operators.quantization import (
        pq_encode,
        pq_topk,
    )

    cb = _toy_codebook(spark)
    combos = list(itertools.product(range(3), repeat=2))
    cents = {(r["sub"], r["cid"]): r["c"] for r in cb.collect()}
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in cents[(0, a)] + cents[(1, b)]])
            for i, (a, b) in enumerate(combos)
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(emb, q, k=5)
    codes = pq_encode(emb, cb, m=2)
    got = pq_topk(codes, q, cb.collect(), k=5, m=2)
    # reconstruction is exact, so the SCORES must match; membership at the
    # k-boundary can differ when distinct vectors tie in cosine (the two
    # float paths sum in different orders), so compare score multisets
    e = sorted(
        (r["query_id"], round(r["cosine"], 4)) for r in exact.collect()
    )
    g = sorted((r["query_id"], round(r["score"], 4)) for r in got.collect())
    assert e == g


def test_pq_trained_recall(spark, sf_dir):
    from mapreduce_big_data_processing_spark.operators import quantization as QZ

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = QZ.pq_train(emb, m=8, k=16, iters=3)
    codes = QZ.pq_encode(emb, cb, m=8)
    got = QZ.pq_topk(codes, q, cb.collect(), k=10, m=8)
    exact = S.brute_force_topk(emb, q, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    recall = len(e & g) / len(e)
    # PQ is lossy on random gaussians; the bound pins "works at all, and
    # codebooks are trained" — exactness is covered by the golden test
    assert recall >= 0.25, f"PQ recall@10 {recall}"


def test_quantized_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(emb, q, k=10)
    quant = QZ.quantized_topk(emb, q, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"]) for r in quant.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.9, f"int8 recall@10 {recall}"


def test_strip_boilerplate_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha\n\nCOPYRIGHT FOOTER\n\nbody one"),
            (2, "different beta\n\ncopyright footer"),
            (3, "gamma text\n\nCopyright  Footer\n\nmore gamma"),
            (4, "no template here at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in C.strip_boilerplate(
            docs, min_doc_frac=0.5, paragraph_regex=r"\n{2,}"
        ).collect()
    }
    # footer appears in 3/4 docs (> 0.5) under whitespace/case canon → all
    # occurrences dropped; unique paragraphs survive
    assert out[1]["text_kept"] == "unique alpha body one"
    assert out[2]["text_kept"] == "different beta"
    assert out[3]["text_kept"] == "gamma text more gamma"
    assert out[4]["text_kept"] == "no template here at all"
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 2
    # below threshold → nothing stripped
    keep_all = C.strip_boilerplate(
        docs, min_doc_frac=0.9, paragraph_regex=r"\n{2,}"
    )
    assert keep_all.filter(F.col("n_kept") != F.col("n_chunks")).count() == 0


def test_ivf_pq_full_probe_matches_exhaustive_adc(spark, sf_dir):
    """IVF pruning must be lossless at full probe: n_probe = n_centroids
    makes ivf_pq_topk scan every bucket, so its answer must equal the
    exhaustive pq_topk crossJoin on the same codes/codebook — pruning
    changes WHICH buckets are scored, never HOW."""
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.operators import quantization as QZ

    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()]
    cb = QZ.pq_train(emb, m=2, k=4, iters=1)
    cb_rows = cb.collect()
    codes = QZ.pq_encode(emb, cb, m=2)
    index = QZ.ivf_pq_index(emb, cents, cb, m=2)
    exhaustive = {
        (r.query_id, r.rank): (r.vec_id, round(r.score, 6))
        for r in QZ.pq_topk(codes, q, cb_rows, k=5, m=2).collect()
    }
    full_probe = {
        (r.query_id, r.rank): (r.vec_id, round(r.score, 6))
        for r in QZ.ivf_pq_topk(
            index, q, cents, cb_rows, k=5, n_probe=len(cents), m=2
        ).collect()
    }
    assert full_probe == exhaustive


def test_duplicate_spans_golden(spark):
    """Exact-substring spans: overlap + adjacency merge into one maximal
    island, a single unique token splits islands, and intra-doc-only
    repetition never fires (min_docs=2 counts DISTINCT docs)."""
    shared_a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"  # 10 tokens, dup k=8 windows 1..3
    shared_b = "u1 u2 u3 u4 u5 u6 u7 u8"  # exactly k tokens
    docs = spark.createDataFrame(
        [
            # doc 1: [shared_a][GAP][shared_b] -> two islands split by 'gap'
            (1, shared_a + " gap " + shared_b),
            (2, shared_a + " tailx taily"),
            (3, "head1 head2 " + shared_b),
            # doc 4: self-repeats a phrase no other doc has -> no span
            (4, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in D.duplicate_spans(docs, k=8).collect()
    )
    assert out == [
        (1, 1, 10, 10),   # windows 1..3 of shared_a merged (overlap)
        (1, 12, 19, 8),   # shared_b after the gap token at position 11
        (2, 1, 10, 10),
        (3, 3, 10, 8),
    ]


@pytest.mark.slow
def test_duplicate_spans_portable_matches_default(spark):
    docs = spark.createDataFrame(
        [(i, f"pfx{i} common run of eight tokens exactly here now end{i}")
         for i in range(4)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, D.duplicate_spans(docs, k=8).collect()))
    b = sorted(map(tuple, D.duplicate_spans(docs, k=8, portable=True).collect()))
    assert a == b and len(a) == 4


def test_strip_duplicate_spans_owner_keeps_text(spark):
    """The minimum-id holder of a duplicated shingle keeps its text; other
    holders lose the merged island. Docs shorter than k and empty docs are
    no-ops (the guarded window sequence — Spark's sequence(1, 0) would
    otherwise count DOWN and fabricate windows)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    docs = spark.createDataFrame(
        [
            (1, "intro " + shared),        # owner (min doc_id)
            (2, shared + " outro"),        # loses the 9-token island
            (3, "tiny doc"),               # < k tokens
            (4, ""),                       # empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_kept"], r["n_tokens"], r["n_removed"])
        for r in D.strip_duplicate_spans(docs, k=8).collect()
    }
    assert out[1] == ("intro " + shared, 10, 0)
    assert out[2] == ("outro", 10, 9)
    assert out[3] == ("tiny doc", 2, 0)
    assert out[4] == ("", 0, 0)


@pytest.mark.slow
def test_containment_pairs_detects_embedded_doc(spark):
    """A doc fully quoted inside one 4x its size has low Jaccard but
    containment 1.0 — the asymmetric statistic must flag it, and the
    integer cross-multiplication threshold must match the rational
    semantics exactly."""
    quoted = "q1 q2 q3 q4 q5"
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, "a1 a2 a3 a4 a5 a6 a7 " + quoted + " z1 z2 z3 z4 z5 z6 z7"),
            (3, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(docs, k=3)
    out = {(r["id_a"], r["id_b"]): r for r in D.containment_pairs(sh, min_pct=80).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["shared"] == r["size_a"] == 3  # all of doc 1's 3-shingles
    # Jaccard would be 3/(3+19-3) < 0.2, below any near-dup threshold
    jac = D.jaccard_pairs(sh, min_jaccard=0.5).collect()
    assert not any(p["id_a"] == 1 and p["id_b"] == 2 for p in jac)


def test_incremental_dedup_statuses(spark):
    """All three statuses, with history taking precedence over the
    within-batch canonical (retried ingests converge)."""
    new = spark.createDataFrame(
        [
            (10, "already accepted"),  # in history -> dup_of_history
            (11, "brand new text"),  # unique -> kept
            (12, "twice in batch"),  # batch canonical -> kept
            (13, "twice in batch"),  # larger id -> dup_in_batch
            (14, "already  ACCEPTED "),  # canon-equal to history
        ],
        "doc_id bigint, text string",
    )
    hist_docs = spark.createDataFrame(
        [(1, "Already Accepted")], "doc_id bigint, text string"
    )
    hist = hist_docs.select(
        D.content_fingerprint(F.col("text")).alias("fingerprint")
    )
    got = {
        r["doc_id"]: r["status"]
        for r in D.incremental_dedup(new, hist).collect()
    }
    assert got == {
        10: "dup_of_history",
        11: "kept",
        12: "kept",
        13: "dup_in_batch",
        14: "dup_of_history",
    }


def test_incremental_near_dup_statuses_and_convergence(spark):
    """The MinHash sibling of incremental_dedup: (1) a doc nearly
    identical to an accepted one classifies near_dup_of_history, a
    batch-internal near-pair marks only its larger id, a unique doc is
    kept; (2) convergence — re-ingesting the accepted corpus against its
    own signature index classifies EVERY doc near_dup_of_history with
    est_jaccard 1.0 (the retried-ingest rule)."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    hist_docs = spark.createDataFrame(
        [(1, base), (2, "completely different historical content here ok " * 4)],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base + "extra"),      # near hist doc 1
            (11, "unrelated fresh text that matches nothing else at all " * 4),
            (12, "twin pair in the new batch sharing every shingle yes " * 4),
            (13, "twin pair in the new batch sharing every shingle yes " * 4 + "tail"),
        ],
        "doc_id bigint, text string",
    )
    index = D.minhash_signatures(D.shingles(hist_docs, k=3), n_hashes=16)
    sigs = D.minhash_signatures(D.shingles(new, k=3), n_hashes=16)
    got = {
        r["doc_id"]: (r["status"], r["matched_id"])
        for r in D.incremental_near_dup(sigs, index).collect()
    }
    assert got[10] == ("near_dup_of_history", 1)
    assert got[11] == ("kept", -1)
    assert got[12] == ("kept", -1)  # smaller id of the batch pair
    assert got[13] == ("near_dup_in_batch", 12)

    replay = {
        (r["status"], r["matched_id"], r["est_jaccard"])
        for r in D.incremental_near_dup(
            index.withColumn("doc_id", F.col("doc_id") + 100), index
        ).collect()
    }
    assert replay == {("near_dup_of_history", 1, 1.0), ("near_dup_of_history", 2, 1.0)}


def test_multi_epoch_near_dup_equals_sequential_fold(spark, sf_dir):
    """The property a backfill relies on: classifying N ingest days in
    ONE plan (multi_epoch_near_dup) must agree row-for-row with actually
    folding incremental_near_dup over the days with an accumulating
    signature index (the index records EVERY ingested doc's signatures,
    kept or dup — near-of-near still attributes to history even when its
    neighbor was itself discarded)."""
    from mapreduce_big_data_processing_spark import catalog

    docs = catalog.load(spark, "documents", sf_dir)
    sig = D.minhash_signatures(D.shingles(docs, k=3), n_hashes=16).cache()
    sigs = sig.withColumn("epoch", (F.col("doc_id") % 3).cast("int"))

    one_shot = {
        r["doc_id"]: (r["status"], r["matched_id"], r["est_jaccard"])
        for r in D.multi_epoch_near_dup(sigs).collect()
    }

    folded = {}
    index = None
    for ep in range(3):
        batch = sigs.filter(F.col("epoch") == ep).drop("epoch")
        if index is None:
            # day 0 has no history: classify against an empty index
            empty = batch.limit(0)
            out = D.incremental_near_dup(batch, empty)
        else:
            out = D.incremental_near_dup(batch, index)
        for r in out.collect():
            folded[r["doc_id"]] = (r["status"], r["matched_id"], r["est_jaccard"])
        index = batch if index is None else index.unionByName(batch)

    assert folded == one_shot
    assert any(v[0] == "near_dup_of_history" for v in folded.values())


def test_multi_epoch_near_dup_reingested_id_classifies_per_instance(spark):
    """r5 ADVICE regression: a doc_id appearing in MORE than one epoch
    must classify per (id, epoch) instance — the epoch-0 arrival judged
    only against epochs before it (kept, here), the epoch-2 re-ingest
    against its own earlier instance (near_dup_of_history matched to its
    own id, exactly what the daily fold's accumulating index decides).
    Before the fix the id-keyed windows/joins fanned ONE classification
    to both rows, so the first arrival could be labeled a dup of its own
    future copy."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(
        [
            (1, 0, base),
            (2, 1, "completely different content in the middle epoch ok " * 4),
            (1, 2, base),  # identical re-ingest of doc 1 two epochs later
        ],
        "doc_id bigint, epoch int, text string",
    )
    # build per-instance signatures: shingle each (id, epoch) row
    sigs = None
    for ep in [0, 1, 2]:
        part = D.minhash_signatures(
            D.shingles(docs.filter(F.col("epoch") == ep), k=3), n_hashes=16
        ).withColumn("epoch", F.lit(ep))
        sigs = part if sigs is None else sigs.unionByName(part)
    got = {
        (r["doc_id"], r["epoch"]): (r["status"], r["matched_id"], r["est_jaccard"])
        for r in D.multi_epoch_near_dup(sigs).collect()
    }
    assert got[(1, 0)] == ("kept", -1, 0.0)
    assert got[(2, 1)] == ("kept", -1, 0.0)
    assert got[(1, 2)] == ("near_dup_of_history", 1, 1.0)
