"""Deduplication operators for LLM training-data pipelines (driver extension;
BASELINE.json north star — not in the reference, which never dedups beyond
`ppt/Ch7….pdf p.26-28` combiner dedup of <year,country> pairs).

All operators are pure DataFrame plans designed to scale:
  - exact dedup: one hash-groupBy shuffle on a fingerprint;
  - MinHash+LSH: shingle explode → per-(doc, hash_i) min-aggregation →
    band signature equi-join — no O(n²) stage; candidate verification joins
    only banded pairs;
  - SimHash: per-token bit explode → weighted bit-majority per doc;
  - n-gram Jaccard: shingle inverted-index self-join (exact, for bounded
    corpora or as LSH verification).

Hashing comes in two flavors:
  - ``portable=True``: md5-derived 60-bit ints — bit-identical in any engine
    (used by the DuckDB oracle differential tests);
  - ``portable=False`` (default): xxhash64 — one JVM hash per value, ~10×
    cheaper; the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: normalize → lowercase, collapse whitespace (fingerprint canon form)
def _canon(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def _hash60(col: Column, portable: bool) -> Column:
    """Deterministic non-negative 60-bit hash of a string column."""
    if portable:
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    return F.abs(F.xxhash64(col))


def content_fingerprint(text_col) -> "F.Column":
    """Normalized-content fingerprint (md5 of the canonicalized text) —
    the exact-dedup key, exposed so pipelines can compute it scan-side and
    dedup with a window instead of re-scanning through exact_dedup."""
    return F.md5(_canon(text_col))


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup by normalized-content fingerprint.

    Output: (doc_id, fingerprint, canonical_id, is_duplicate) — canonical is
    the minimum id per fingerprint group. One shuffle on the fingerprint:
    the canonical is a window min over the fingerprint partitioning, not a
    groupBy + rejoin, so the scan runs once and nothing needs caching
    (earlier cache-based form leaked executor storage across long-lived
    sessions sweeping many queries).
    """
    from pyspark.sql import Window

    fp = docs.select(
        F.col(id_col), content_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    canon = F.min(id_col).over(Window.partitionBy("fingerprint"))
    return (
        fp.withColumn("canonical_id", canon)
        .withColumn("is_duplicate", (F.col(id_col) != F.col("canonical_id")).cast("int"))
        .select(id_col, "fingerprint", "canonical_id", "is_duplicate")
    )


def incremental_dedup(
    new_docs: DataFrame,
    existing_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingest exact dedup: classify every document of a NEW
    batch against the historical fingerprint index AND within the batch —
    the continuous-ingest shape of :func:`exact_dedup` (a daily crawl
    drop deduped against everything already accepted; re-running over
    history from scratch at 100 TB is the anti-pattern this replaces).

    ``existing_fps`` is any DataFrame with a ``fingerprint`` column (the
    persisted index; the accepted corpus's fingerprints at worst). Status
    per new doc: ``dup_of_history`` (fingerprint already accepted) >
    ``dup_in_batch`` (not historical, but a smaller-id batch sibling has
    the same fingerprint) > ``kept``. History wins over batch-canonical
    so retries converge: re-ingesting an already-accepted batch marks
    every row ``dup_of_history``.

    Scale shape: one shuffle of the (id, fingerprint) projection of the
    NEW batch (small by definition) against the index on fingerprint —
    the index side is pre-groupable/bucketable by fingerprint so only the
    batch genuinely moves; the within-batch canonical is a window min over
    the join output's fingerprint partitioning — no rejoin, no cache (the
    earlier cached projection leaked executor storage across long-lived
    sweep sessions).
    """
    from pyspark.sql import Window

    fp = new_docs.select(
        F.col(id_col), content_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    hist = (
        existing_fps.select("fingerprint")
        .distinct()
        .withColumn("__in_hist", F.lit(1))
    )
    batch_canon = F.min(id_col).over(Window.partitionBy("fingerprint"))
    return (
        fp.join(hist, "fingerprint", "left")
        .withColumn("batch_canonical", batch_canon)
        .withColumn(
            "status",
            F.when(F.col("__in_hist") == 1, F.lit("dup_of_history"))
            .when(F.col(id_col) != F.col("batch_canonical"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept")),
        )
        .select(id_col, "fingerprint", "status")
    )


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    extra_key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, sig) band-bucket keys of a MinHash signature table — the
    row an LSH *index* persists per accepted document. Factored out of
    :func:`lsh_candidate_pairs` so an incremental ingest can band a new
    batch and join it against a stored index built with the same call.
    ``extra_key_cols`` widen the document key (e.g. the ingest epoch) so
    a table whose ids repeat across batches bands each instance
    separately instead of silently merging their signature rows."""
    rows_per_band = n_hashes // bands
    return (
        signatures.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy(id_col, *extra_key_cols, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("h"), F.col("minhash")))
                        ),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )


def incremental_near_dup(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Incremental-ingest NEAR dedup: classify a new batch's MinHash
    signatures against a persisted signature index — the near-dup sibling
    of :func:`incremental_dedup`, and the shape a continuous-ingest
    pipeline actually runs at 100 TB (recomputing all-corpus LSH per daily
    drop is the anti-pattern this replaces; the index stores n_hashes
    smallints per accepted doc and nothing else).

    Both sides band with :func:`band_keys`; candidates are band-bucket
    collisions (new×index for history, new×new smaller-id for in-batch).
    Verification is SIGNATURE AGREEMENT — est_jaccard = matching
    minhashes / n_hashes ≥ ``min_est_jaccard`` — because signatures are
    all the index has: no re-read of accepted text, so the verify join
    touches n_hashes rows per candidate. est_jaccard is an exact multiple
    of 1/n_hashes (a binary fraction at the default 16), so no float
    rounding protocol is needed anywhere.

    Status per new doc, same precedence/convergence rule as the exact
    variant (history wins, so re-ingesting an accepted batch classifies
    everything ``near_dup_of_history``):
    ``near_dup_of_history`` > ``near_dup_in_batch`` (a verified
    smaller-id batch sibling) > ``kept``. ``matched_id`` is the
    best-agreeing counterpart (ties to the smallest id; -1 for kept —
    NULL would crash the driver's mixed-column row sort).

    Scale shape: only the batch is shingled/hashed; the index side joins
    pre-bucketable by (band, sig). A boilerplate-heavy corpus concentrates
    band buckets — the new×index bucket join is a plain equi-join, so AQE
    skew-split handles hot buckets; the new×new side reuses
    :func:`lsh_candidate_pairs`'s explicit ``max_bucket`` salting.
    """
    from pyspark.sql import Window

    min_matches = int(min_est_jaccard * n_hashes + 0.999999)  # ceil
    bn = band_keys(new_sigs, id_col, n_hashes, bands)
    bh = band_keys(index_sigs, id_col, n_hashes, bands)

    def _agree(cand: DataFrame, a: str, b: str, sa: DataFrame, sb: DataFrame):
        """matches-per-candidate via the two signature tables (n_hashes
        rows per pair through the joins; candidates are band-bounded)."""
        return (
            cand.join(sa.select(F.col(id_col).alias(a), "h", F.col("minhash").alias("__ma")), a)
            .join(
                sb.select(F.col(id_col).alias(b), "h", F.col("minhash").alias("__mb")),
                [b, "h"],
            )
            .filter(F.col("__ma") == F.col("__mb"))
            .groupBy(a, b)
            .agg(F.count(F.lit(1)).alias("matches"))
            .filter(F.col("matches") >= min_matches)
        )

    hist_cand = (
        bn.select(F.col(id_col).alias("new_id"), "band", "sig")
        .join(bh.select(F.col(id_col).alias("hist_id"), "band", "sig"), ["band", "sig"])
        .select("new_id", "hist_id")
        .distinct()
    )
    hm = _agree(hist_cand, "new_id", "hist_id", new_sigs, index_sigs)
    batch_cand = lsh_candidate_pairs(new_sigs, id_col, n_hashes, bands).select(
        F.col("id_a").alias("small_id"), F.col("id_b").alias("new_id")
    )
    bm = _agree(batch_cand, "new_id", "small_id", new_sigs, new_sigs)

    wbest_h = Window.partitionBy("new_id").orderBy(F.desc("matches"), F.asc("hist_id"))
    hb = (
        hm.withColumn("__rn", F.row_number().over(wbest_h))
        .filter(F.col("__rn") == 1)
        .select("new_id", F.col("hist_id").alias("__h_match"), F.col("matches").alias("__h_m"))
    )
    wbest_b = Window.partitionBy("new_id").orderBy(F.desc("matches"), F.asc("small_id"))
    bb = (
        bm.withColumn("__rn", F.row_number().over(wbest_b))
        .filter(F.col("__rn") == 1)
        .select("new_id", F.col("small_id").alias("__b_match"), F.col("matches").alias("__b_m"))
    )
    ids = new_sigs.select(F.col(id_col)).distinct()
    return (
        ids.join(hb, ids[id_col] == hb["new_id"], "left")
        .drop("new_id")
        .join(bb, ids[id_col] == bb["new_id"], "left")
        .drop("new_id")
        .select(
            id_col,
            F.when(F.col("__h_match").isNotNull(), F.lit("near_dup_of_history"))
            .when(F.col("__b_match").isNotNull(), F.lit("near_dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("__h_match", "__b_match", F.lit(-1)).alias("matched_id"),
            (
                F.coalesce(
                    F.when(F.col("__h_match").isNotNull(), F.col("__h_m")),
                    F.col("__b_m"),
                    F.lit(0),
                )
                / F.lit(float(n_hashes))
            ).alias("est_jaccard"),
        )
    )


def multi_epoch_near_dup(
    sigs: DataFrame,
    epoch_col: str = "epoch",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """N sequential ingest days classified in ONE plan: signatures carry
    an ``epoch_col`` (the batch/day each doc arrived in) and every doc is
    classified exactly as if :func:`incremental_near_dup` had been folded
    over the epochs in order with an accumulating signature index —
    ``near_dup_of_history`` if a verified match exists in ANY earlier
    epoch, else ``near_dup_in_batch`` if a verified smaller-id sibling
    exists in the SAME epoch, else ``kept``. The fold⇔one-shot
    equivalence is pinned by a test (the property backfills rely on:
    re-running the whole history as one job must agree with what the
    daily jobs decided).

    Shape: identical to the single-batch operator — one band-key pass,
    band-bucket equi-joins with epoch inequality/equality predicates on
    top, 16-rows-per-candidate signature verify. The epoch predicate
    prunes AFTER bucket collision, so work is still band-bounded.

    The document key is (id, epoch) THROUGHOUT — banding, candidates,
    verification, and the final classification all carry the epoch (r5
    ADVICE: keying windows/joins on the id alone fanned one
    classification out to every epoch instance of a re-ingested id, so
    an earlier arrival could be labeled ``near_dup_of_history`` from its
    own later copy). A doc re-ingested in a later epoch therefore
    classifies per instance: the later instance matches the earlier one
    as history (exactly what the daily fold does — the index already
    holds its signatures), the earlier instance only sees epochs before
    its own.
    """
    from pyspark.sql import Window

    min_matches = int(min_est_jaccard * n_hashes + 0.999999)  # ceil
    bk = band_keys(
        sigs, id_col, n_hashes, bands, extra_key_cols=(epoch_col,)
    )
    a = bk.select(
        F.col(id_col).alias("other_id"), F.col(epoch_col).alias("other_ep"),
        "band", "sig",
    )
    b = bk.select(
        F.col(id_col).alias("new_id"), F.col(epoch_col).alias("new_ep"),
        "band", "sig",
    )
    hist_cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("other_ep") < F.col("new_ep"))
        .select("new_id", "new_ep", "other_id", "other_ep")
        .distinct()
    )
    batch_cand = (
        a.join(b, ["band", "sig"])
        .filter((F.col("other_ep") == F.col("new_ep")) & (F.col("other_id") < F.col("new_id")))
        .select("new_id", "new_ep", "other_id", "other_ep")
        .distinct()
    )

    sl = sigs.select(
        F.col(id_col).alias("new_id"), F.col(epoch_col).alias("new_ep"),
        "h", F.col("minhash").alias("__ma"),
    )
    sr = sigs.select(
        F.col(id_col).alias("other_id"), F.col(epoch_col).alias("other_ep"),
        "h", F.col("minhash").alias("__mb"),
    )

    def _agree(cand):
        return (
            cand.join(sl, ["new_id", "new_ep"])
            .join(sr, ["other_id", "other_ep", "h"])
            .filter(F.col("__ma") == F.col("__mb"))
            # per (new instance, other INSTANCE): an other_id present in
            # two earlier epochs must not sum its agreements across them
            .groupBy("new_id", "new_ep", "other_id", "other_ep")
            .agg(F.count(F.lit(1)).alias("matches"))
            .filter(F.col("matches") >= min_matches)
        )

    w = Window.partitionBy("new_id", "new_ep").orderBy(
        F.desc("matches"), F.asc("other_id"), F.asc("other_ep")
    )
    hb = (
        _agree(hist_cand).withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("new_id", "new_ep", F.col("other_id").alias("__h_match"), F.col("matches").alias("__h_m"))
    )
    bb = (
        _agree(batch_cand).withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("new_id", "new_ep", F.col("other_id").alias("__b_match"), F.col("matches").alias("__b_m"))
    )
    ids = sigs.select(id_col, epoch_col).distinct()
    return (
        ids.join(
            hb,
            (ids[id_col] == hb["new_id"]) & (ids[epoch_col] == hb["new_ep"]),
            "left",
        )
        .drop("new_id", "new_ep")
        .join(
            bb,
            (ids[id_col] == bb["new_id"]) & (ids[epoch_col] == bb["new_ep"]),
            "left",
        )
        .drop("new_id", "new_ep")
        .select(
            id_col,
            epoch_col,
            F.when(F.col("__h_match").isNotNull(), F.lit("near_dup_of_history"))
            .when(F.col("__b_match").isNotNull(), F.lit("near_dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("__h_match", "__b_match", F.lit(-1)).alias("matched_id"),
            (
                F.coalesce(
                    F.when(F.col("__h_match").isNotNull(), F.col("__h_m")),
                    F.col("__b_m"),
                    F.lit(0),
                )
                / F.lit(float(n_hashes))
            ).alias("est_jaccard"),
        )
    )


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle).

    Tokenization matches operators.text.TOKEN_SPLIT_RE; the shingle is the
    space-joined k-gram. Implemented as posexplode + window `lead` —
    whole-stage-codegen'd; the array formulation (sequence→transform→slice)
    was 5× slower (interpreted higher-order lambdas). Documents shorter
    than k yield their single clamped shingle (concat_ws skips the null
    leads), matching the sliding-window semantics of the oracle SQL.
    """
    from pyspark.sql import Window

    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: w != ""
    )
    toks = docs.select(F.col(id_col), F.posexplode(words).alias("pos", "w"))
    win = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, k)]
    out = (
        toks.withColumn("shingle", F.concat_ws(" ", *leads))
        .withColumn("__full", F.lead("w", k - 1).over(win).isNotNull())
        .filter(F.col("__full") | (F.col("pos") == 0))
        .select(id_col, "shingle")
    )
    return out.filter(F.col("shingle") != "").distinct()


#: Mersenne prime 2^31-1: (a·x+b) mod P31 stays within int64 for 31-bit x —
#: the same arithmetic is exact in any SQL engine (no int128 needed)
P31 = 2147483647


def _minhash_coeffs(n: int = 64) -> list[tuple[int, int]]:
    """Deterministic affine-hash coefficients (seeded LCG, no RNG import):
    shared verbatim by the Spark expressions and the DuckDB oracle SQL."""
    state = 1234567
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = state % (P31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % P31
        out.append((a, b))
    return out


MINHASH_COEFFS = _minhash_coeffs(64)


def minhash_signatures(
    doc_shingles: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    portable: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature rows: (id, h, minhash) for h in [0, n).

    One base hash per shingle, then n_hashes affine functions
    h_i(x) = (a_i·x + b_i) mod (2^31-1) over the 31-bit base — the classic
    universal-hash family, int64-safe, so the portable (md5-based) flavor
    reproduces bit-for-bit in any SQL engine. (A salted-md5-per-function
    scheme was 6× slower: n_hashes cryptographic hashes per shingle.)
    """
    coeffs = MINHASH_COEFFS[:n_hashes]
    if len(coeffs) < n_hashes:
        raise ValueError(f"n_hashes > {len(MINHASH_COEFFS)} not supported")
    base = _hash60(F.col("shingle"), portable) % P31
    # n_hashes min-aggregates over ONE pass of the shingle rows (map-side
    # partial agg; shuffle carries n_docs rows), then unpivot to long form.
    # The explode-by-n_hashes formulation pushed n_hashes× the rows through
    # the shuffle and was ~1.5× slower end-to-end.
    mins = [
        F.min((F.lit(a) * F.col("base") + F.lit(b)) % P31).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_doc = (
        doc_shingles.select(F.col(id_col), base.alias("base"))
        .groupBy(id_col)
        .agg(*mins)
    )
    stack = "stack({}, {}) as (h, minhash)".format(
        n_hashes, ", ".join(f"{i}, m{i}" for i in range(n_hashes))
    )
    return per_doc.select(F.col(id_col), F.expr(stack))


def _combination_pairs(ids: Column) -> Column:
    """All position combinations i<j of an array as (id_a, id_b) structs.
    On a sorted array this yields value-ordered pairs; work is |ids|²/2
    inside ONE task, so callers must bound |ids| (see _bucket_pair_rows)."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _bucket_pair_rows(
    grouped: DataFrame,
    key_cols: list[str],
    id_col: str,
    max_bucket: int,
    materialize_sizes: bool = False,
) -> DataFrame:
    """Co-occurrence pairs per key bucket with BOUNDED per-task work — the
    LSH/inverted-index skew fix (VERDICT r3 #2).

    A bucket of n ids implies n²/2 pairs; the naive collect-then-expand
    does all of that inside ONE task's array lambda, so a single
    degenerate bucket (boilerplate shingles — the normal case in web-crawl
    dedup) serializes the stage. Here buckets are sized with a window
    count (one exchange on the key, REUSED by both branches below via
    exchange reuse), then:

    - buckets with ≤ ``max_bucket`` ids take the original path — group,
      sort, expand combinations — with no further exchange (the groupBy
      reuses the window's key partitioning);
    - oversized buckets salt each id into ``ceil(n/max_bucket)``
      sub-buckets by id hash and emit WITHIN each sub-bucket plus ACROSS
      each sub-bucket pair (every pair lands in exactly one
      (min(s_a,s_b), max(s_a,s_b)) group, so output is identical to the
      uncapped expansion); the (key, ga, gb) groups are spread across
      tasks by an explicit repartition — only the oversized buckets'
      replicated rows (n·ceil(n/max_bucket), ≪ the n² pairs themselves)
      pay that second exchange.

    Per-task bound: ≤ 2·max_bucket input ids and ≤ max_bucket² emitted
    pairs per group. Multiplicity: one output row per position pair, so a
    duplicated (key, id) input row contributes multiplicatively — callers
    wanting set semantics dedupe first or ``distinct()`` after. Rows with
    id_a == id_b are possible only from duplicated input rows; callers
    filter them.

    ``materialize_sizes=True`` (r5 verdict ask #3 — the observed-max
    gate): ``localCheckpoint`` the sized table, so the key exchange AND
    the window execute exactly ONCE (lazily, only the exchange is reused
    — each branch re-runs the window over the shuffle files), and the
    observed max bucket size becomes a cheap block scan. When no bucket
    exceeds ``max_bucket`` the big branch (its repartition, the union,
    the second distinct input) is dropped from the plan entirely —
    measured 2.75 s → 2.0 s on the sf0.1 minhash headline. Opt-in
    because the checkpoint materializes the input: right for INDEX-sized
    tables (banded signatures — ~0.2% of corpus bytes), wrong for
    corpus-sized ones (shingle posting lists — containment_pairs keeps
    the lazy two-branch plan). Same trade `graph.py` makes for iterative
    edges: blocks are not recomputed on executor loss.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    sized = grouped.withColumn(
        "__ns",
        F.ceil(F.count(F.lit(1)).over(w) / F.lit(max_bucket)).cast("int"),
    )
    skip_big = False
    if materialize_sizes:
        from pyspark import StorageLevel

        # DISK_ONLY: checkpoint blocks live until the DataFrame is
        # GC'd, so repeated invocations in one long session would
        # accumulate — on the default MEMORY_AND_DISK level that
        # exhausted a 16 g heap after three 1000×-fixture runs; on disk
        # the leak is bounded by free disk and the read-back cost is a
        # sequential scan of an index-sized table. eager=False: the max
        # action right below materializes the checkpoint inside its own
        # job, so build runs ONE job (checkpoint+max fused) instead of two
        # back-to-back passes over the same banded table.
        sized = sized.localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY
        )
        max_ns = sized.agg(F.max("__ns")).first()[0]
        skip_big = max_ns is None or max_ns <= 1

    small_ids = F.array_sort(F.collect_list(F.col(id_col)))
    small_pairs = (
        sized.filter(F.col("__ns") == 1)
        .groupBy(*key_cols)
        .agg(small_ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(*key_cols, F.explode(_combination_pairs(F.col("ids"))).alias("p"))
        .select(*key_cols, F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )
    if skip_big:
        return small_pairs

    sub = F.pmod(F.xxhash64(F.col(id_col)), F.col("__ns")).cast("int")
    groups = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.col("__ns") - 1),
            lambda o: F.struct(
                F.least(F.col("__sub"), o).alias("ga"),
                F.greatest(F.col("__sub"), o).alias("gb"),
            ),
        )
    )
    big = (
        sized.filter(F.col("__ns") > 1)
        .withColumn("__sub", sub)
        .select(*key_cols, id_col, "__sub", groups.alias("g"))
        .select(*key_cols, id_col, "__sub", "g.ga", "g.gb")
        .repartition(*key_cols, "ga", "gb")
    )
    ids_a = F.array_sort(
        F.collect_list(F.when(F.col("__sub") == F.col("ga"), F.col(id_col)))
    )
    ids_b = F.array_sort(
        F.collect_list(
            F.when(
                (F.col("ga") != F.col("gb")) & (F.col("__sub") == F.col("gb")),
                F.col(id_col),
            )
        )
    )
    cross = F.flatten(
        F.transform(
            F.col("ids_a"),
            lambda x: F.transform(
                F.col("ids_b"),
                lambda y: F.struct(
                    F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
                ),
            ),
        )
    )
    big_pairs = (
        big.groupBy(*key_cols, "ga", "gb")
        .agg(ids_a.alias("ids_a"), ids_b.alias("ids_b"))
        .select(
            *key_cols,
            F.explode(
                F.when(
                    F.col("ga") == F.col("gb"),
                    _combination_pairs(F.col("ids_a")),
                ).otherwise(cross)
            ).alias("p"),
        )
        .select(*key_cols, F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )
    return small_pairs.unionByName(big_pairs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 4096,
    materialize_sizes: bool = True,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) sharing at
    least one band — never all-pairs.

    Pairs generate from per-(band, signature) bucket id-lists (group, then
    expand each bucket's combinations) instead of a banded-table self-join:
    one aggregation pass, no second execution of the signature subplan, and
    the combination lambdas only touch tiny bucket arrays. Buckets are the
    LSH skew point — a boilerplate-heavy corpus concentrates ids into one
    giant bucket whose n²/2 expansion would run inside a single task — so
    buckets above ``max_bucket`` ids are salted into sub-buckets and their
    pairs emitted within+across sub-buckets with bounded per-task work and
    IDENTICAL output (see _bucket_pair_rows).

    ``materialize_sizes=True`` (the default) makes CONSTRUCTION eager: it
    ``localCheckpoint``\\ s the banded table and runs a max-bucket action at
    build time so the skew branch is dropped from the plan when no bucket
    exceeds ``max_bucket`` (see _bucket_pair_rows). The banded table is
    index-sized (n_docs × bands rows), so this is cheap — but it freezes
    the input as of the call (a source that changes between build and
    execution is not re-read), the checkpointed blocks are not recomputed
    on executor loss, and it cannot run on a streaming input. Library
    callers needing the lazy two-branch plan pass ``False``."""
    banded = band_keys(signatures, id_col, n_hashes, bands)
    return (
        _bucket_pair_rows(
            banded, ["band", "sig"], id_col, max_bucket,
            materialize_sizes=materialize_sizes,
        )
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    doc_shingles: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing ≥1 shingle.

    Output: (id_a, id_b, jaccard) with id_a < id_b. If ``candidates`` is
    given (e.g. from LSH), only those pairs are scored — the scale path.
    Otherwise the inverted-index self-join bounds work to co-occurring pairs.
    """
    sizes = doc_shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = doc_shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = doc_shingles.select(F.col(id_col).alias("id_b"), "shingle")
    if candidates is not None:
        # candidate-first: expand each candidate pair with side-a shingles,
        # then equi-join side b on (id_b, shingle) — work is proportional to
        # the candidate set, not to every co-occurring pair in the corpus
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Per-doc SimHash: token hashes vote ±tf on each bit; sign → bit.

    Output: (id, simhash bigint). Near-dups = small Hamming distance; pair
    generation at scale goes through band-rotation equi-joins (round 2).
    One shuffle (groupBy id, bit) + one (groupBy id).
    """
    words = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    toks = docs.select(F.col(id_col), F.explode(words).alias("w")).filter(
        F.col("w") != ""
    )
    tf = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    hashed = tf.withColumn("hv", _hash60(F.col("w"), portable))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        hashed.select(F.col(id_col), "hv", "tf", bit)
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(hv, bit) & 1") == 1, F.col("tf")).otherwise(
                -F.col("tf")
            ),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def simhash_pairs(
    sims: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via band-rotation equi-joins (the Google
    crawl-dedup construction, Manku et al. WWW'07): split each signature
    into ``bands`` contiguous bit slices; by pigeonhole, any pair with
    Hamming distance ≤ bands-1 agrees on at least one whole slice, so for
    ``max_hamming < bands`` the banded equi-join is EXACT (recall 1) —
    never all-pairs. One shuffle on (band, slice-value); candidates carry
    only (id, simhash bigint); verification is one bit_count(xor) per
    candidate. Output: (id_a, id_b, hamming), id_a < id_b.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for "
            f"exact recall (pigeonhole); got bands={bands}"
        )
    width = bits // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.expr(f"shiftright(simhash, {i * width}) & {mask}")
            for i in range(bands)
        ]
    )
    tagged = sims.select(
        F.col(id_col).alias("__id"),
        F.col("simhash").alias("__sh"),
        F.posexplode(slices).alias("band", "key"),
    )
    a = tagged.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"), "band", "key"
    )
    b = tagged.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.expr("__sha ^ __shb")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _safe_seq(stop: Column) -> Column:
    """sequence(1, stop) that is EMPTY when stop < 1. Spark's sequence
    counts DOWN for stop < start (sequence(1, 0) = [1, 0]), which would
    fabricate windows on documents shorter than the shingle width; SQL
    engines' generate_series(1, 0) is empty — this matches that."""
    return F.filter(
        F.sequence(F.lit(1), F.greatest(stop, F.lit(1))), lambda i: i <= stop
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Exact-substring duplicated spans (Lee et al. ACL'22, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal run of
    whitespace tokens that appears verbatim in >= ``min_docs`` distinct
    documents, at k-token granularity.

    The suffix-array construction of the paper is single-machine; the
    distributed equivalent is shingle-vote + interval merge:

      1. every k-token window (start position, space-joined shingle) is
         hashed scan-side — the corpus never shuffles raw text;
      2. one groupBy on the shingle hash counts DISTINCT docs; hashes seen
         in >= min_docs docs are the duplicated vocabulary (data-sized, so
         a shuffle semi-join, never a broadcast);
      3. each doc's hit positions [i, i+k-1] are merged into maximal
         islands with ONE exchange on doc_id: running max(end) over the
         preceding rows marks island breaks, a cumulative sum numbers them,
         and the final (doc, island) groupBy reuses the same hash
         partitioning (no extra exchange — pinned by the plan test).

    Output: (doc_id, span_start, span_end, span_tokens), 1-based inclusive
    token indexes. Adjacent hits merge (gap 0); a single unique token
    between two duplicated runs splits them. ``portable=True`` uses the
    md5-derived 60-bit hash so an external SQL engine reproduces the exact
    grouping keys; default xxhash64 is the cheap 100 TB path. Collisions
    (either mode) would only ever ADD a span, and affect both engines
    identically under portable mode.
    """
    from pyspark.sql import Window

    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = docs.select(F.col(id_col), ws.alias("__ws"))
    # (start, hash(shingle)) per k-window; sequence is empty when n < k
    sh = base.select(
        id_col,
        F.explode(
            F.transform(
                _safe_seq(F.size("__ws") - (k - 1)),
                lambda i: F.struct(
                    i.alias("st"),
                    _hash60(
                        F.array_join(F.slice("__ws", i, k), " "), portable
                    ).alias("h"),
                ),
            )
        ).alias("s"),
    ).select(id_col, F.col("s.st").alias("st"), F.col("s.h").alias("h"))
    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    hits = sh.join(dup, "h", "left_semi").select(
        id_col, "st", (F.col("st") + (k - 1)).alias("en")
    )
    by_doc = Window.partitionBy(id_col).orderBy("st")
    prev = by_doc.rowsBetween(Window.unboundedPreceding, -1)
    isl = hits.withColumn(
        "brk",
        (
            F.col("st")
            > F.coalesce(F.max("en").over(prev), F.lit(-1)) + 1
        ).cast("int"),
    ).withColumn("g", F.sum("brk").over(by_doc))
    return (
        isl.groupBy(id_col, "g")
        .agg(
            F.min("st").cast("int").alias("span_start"),
            F.max("en").cast("int").alias("span_end"),
            (F.max("en") - F.min("st") + 1).cast("int").alias("span_tokens"),
        )
        .drop("g")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Remove-all-but-one-occurrence span cleaning (the application of
    ``duplicate_spans``, per Lee et al. ACL'22 §3.1): for every k-token
    shingle shared by >= 2 docs, the minimum-id doc among its holders is
    the canonical owner and keeps its text; every OTHER doc's hit
    positions are merged into islands and those token runs are dropped.

    Same shuffle inventory as ``duplicate_spans`` plus one id join to
    bring islands back to the token arrays; reconstruction is a
    scan-side projection (tokens whose position falls in no island,
    re-joined by spaces) — per-doc cost O(tokens × islands), no extra
    exchange.

    Output: (doc_id, text_kept, n_tokens, n_removed) — integers and the
    cleaned text; text_kept equals the whitespace-normalized original
    when nothing was removed.
    """
    from pyspark.sql import Window

    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # NOT cached: the shingle branch and the final join both re-tokenize
    # (two scans of the text column). Pinning a corpus-sized token-array
    # projection in executor storage is the wrong trade at 100 TB — and a
    # cache here outlives the query in long sweep sessions (storage leak).
    base = docs.select(F.col(id_col), ws.alias("__ws"))
    sh = base.select(
        id_col,
        F.explode(
            F.transform(
                _safe_seq(F.size("__ws") - (k - 1)),
                lambda i: F.struct(
                    i.alias("st"),
                    _hash60(
                        F.array_join(F.slice("__ws", i, k), " "), portable
                    ).alias("h"),
                ),
            )
        ).alias("s"),
    ).select(id_col, F.col("s.st").alias("st"), F.col("s.h").alias("h"))
    owners = (
        sh.groupBy("h")
        .agg(
            F.count_distinct(id_col).alias("nd"),
            F.min(id_col).alias("owner"),
        )
        .filter(F.col("nd") >= 2)
        .select("h", "owner")
    )
    hits = (
        sh.join(owners, "h")
        .filter(F.col(id_col) != F.col("owner"))
        .select(id_col, "st", (F.col("st") + (k - 1)).alias("en"))
    )
    by_doc = Window.partitionBy(id_col).orderBy("st")
    prev = by_doc.rowsBetween(Window.unboundedPreceding, -1)
    isl = (
        hits.withColumn(
            "brk",
            (
                F.col("st")
                > F.coalesce(F.max("en").over(prev), F.lit(-1)) + 1
            ).cast("int"),
        )
        .withColumn("g", F.sum("brk").over(by_doc))
        .groupBy(id_col, "g")
        .agg(F.min("st").alias("st"), F.max("en").alias("en"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("st", "en")).alias("__isl"))
    )
    joined = base.join(isl, id_col, "left").withColumn(
        "__isl", F.coalesce("__isl", F.array())
    )
    keep = F.filter(
        F.transform(
            _safe_seq(F.size("__ws")),
            lambda i: F.struct(
                i.alias("p"), F.element_at("__ws", i).alias("w")
            ),
        ),
        lambda s: ~F.exists(
            F.col("__isl"),
            lambda b: (s["p"] >= b["st"]) & (s["p"] <= b["en"]),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(F.transform(keep, lambda s: s["w"]), " ").alias(
            "text_kept"
        ),
        F.size("__ws").cast("int").alias("n_tokens"),
        (F.size("__ws") - F.size(keep)).cast("int").alias("n_removed"),
    )


def containment_pairs(
    doc_shingles: DataFrame,
    id_col: str = "doc_id",
    min_pct: int = 80,
    candidates: DataFrame | None = None,
    max_posting: int = 4096,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle-set CONTAINMENT
    (Broder, SEQUENCES'97: containment(A in B) = |A∩B| / |A|): finds
    documents QUOTED or EMBEDDED inside larger ones, which symmetric
    Jaccard misses (a doc fully contained in one 10× its size has
    Jaccard ≤ 0.1 but containment 1.0).

    Emits exact integer sufficient statistics — (id_a, id_b, shared,
    size_a, size_b), both directions' containments derivable — and
    thresholds by cross-multiplication (shared·100 ≥ min_pct·min(size)),
    so there is no float anywhere (the zero-float protocol). Same
    inverted-index / candidate-first shapes as ``jaccard_pairs``: pass
    LSH ``candidates`` at scale; the inverted-index form bounds work to
    co-occurring pairs for bounded corpora or verification, with the
    per-shingle posting list CAPPED at ``max_posting`` ids — a
    boilerplate shingle held by n docs implies n²/2 pair contributions,
    which _bucket_pair_rows salts across sub-bucket groups instead of
    expanding inside one task (identical counts: every co-occurring pair
    contributes exactly once per shared shingle row).
    """
    sizes = doc_shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        a = doc_shingles.select(F.col(id_col).alias("id_a"), "shingle")
        b = doc_shingles.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    else:
        inter = (
            _bucket_pair_rows(doc_shingles, ["shingle"], id_col, max_posting)
            .filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(
            F.col("shared") * 100
            >= F.lit(min_pct) * F.least("size_a", "size_b")
        )
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("size_b").cast("bigint").alias("size_b"),
        )
    )


def prefix_filtered_jaccard_pairs(
    doc_shingles: DataFrame,
    id_col: str = "doc_id",
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """EXACT Jaccard threshold join via a LOSSLESS prefix filter
    (Chaudhuri et al. ICDE'06; the PPJoin family, Xiao et al. WWW'08).

    Any pair with J(A, B) >= t = t_num/t_den must share a token within the
    first ``|A| - ceil(t*|A|) + 1`` tokens of A under ANY global token
    order (pigeonhole: missing all of them leaves fewer than t*|A| tokens
    to overlap). Ordering tokens by ASCENDING document frequency puts the
    RAREST tokens in the prefix, so the inverted index that generates
    candidates drops every frequent head token — at 100 TB that is the
    difference between an index on 'the' (quadratic candidate blowup) and
    an index on near-unique shingles. Unlike MinHash/LSH this path is
    exact: the threshold test is integer cross-multiplication
    ``t_den * inter >= t_num * union`` — no float, no recall loss, so the
    all-pairs SQL oracle checks it verbatim.

    Shuffles: token-df groupBy, df join back (on shingle), per-doc window
    (on id), prefix self-join (on shingle, prefix rows only), candidate
    verification joins. The verification is candidate-first like
    ``jaccard_pairs(candidates=...)``: work scales with surviving
    candidates, not with every co-occurring pair.

    Output: (id_a, id_b, inter, union_sz) — all integers (zero-float
    protocol). Reference parity: the exact, scalable twin of the
    inverted-index Jaccard join (`ngram_jaccard_pairs`).
    """
    from pyspark.sql import Window

    sizes = doc_shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    tok_df = doc_shingles.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__df")
    )
    ranked = (
        doc_shingles.join(tok_df, "shingle")
        .join(sizes, id_col)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__df", "shingle")
            ),
        )
    )
    # prefix length = sz - ceil(t*sz) + 1, all integer:
    # ceil(t_num*sz/t_den) = floor((t_num*sz + t_den - 1) / t_den)
    ceil_t_sz = F.floor(
        (F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)
    )
    prefix = ranked.filter(
        F.col("__rn") <= F.col("sz") - ceil_t_sz + F.lit(1)
    ).select(id_col, "shingle")
    cand = (
        prefix.select(F.col(id_col).alias("id_a"), "shingle")
        .join(prefix.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = doc_shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = doc_shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(
            F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("union_sz")
        )
        .select("id_a", "id_b", "inter", "union_sz")
    )
