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


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup by normalized-content fingerprint.

    Output: (doc_id, fingerprint, canonical_id, is_duplicate) — canonical is
    the minimum id per fingerprint group. One shuffle on the fingerprint.
    """
    fp = docs.select(
        F.col(id_col), F.md5(_canon(F.col(text_col))).alias("fingerprint")
    )
    canon = fp.groupBy("fingerprint").agg(F.min(id_col).alias("canonical_id"))
    return (
        fp.join(canon, "fingerprint")
        .withColumn("is_duplicate", (F.col(id_col) != F.col("canonical_id")).cast("int"))
        .select(id_col, "fingerprint", "canonical_id", "is_duplicate")
    )


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle).

    Tokenization matches operators.text.TOKEN_SPLIT_RE; the shingle is the
    space-joined k-gram. Explode is pipelined (no shuffle until the consumer
    aggregates).
    """
    words = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    words = F.filter(words, lambda w: w != "")
    # sliding k-gram over the token array, JVM-side
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0)) ),
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )
    out = docs.select(F.col(id_col), F.explode(grams).alias("shingle"))
    return out.filter(F.col("shingle") != "").distinct()


def minhash_signatures(
    doc_shingles: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    portable: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature rows: (id, h, minhash) for h in [0, n).

    Each hash function is the base hash salted with the function index —
    no multiply/mod arithmetic, so the portable (md5) flavor is reproducible
    in any SQL engine. Cost: n_hashes hashes per shingle, computed in one
    projection; one shuffle on (id) for the min-aggregation.
    """
    hs = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h")
    salted = F.concat_ws(":", F.col("h").cast("string"), F.col("shingle"))
    return (
        doc_shingles.select(F.col(id_col), hs, F.col("shingle"))
        .withColumn("hv", _hash60(salted, portable))
        .groupBy(id_col, "h")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) sharing at
    least one band. Equi-join on (band, band_signature) — never all-pairs."""
    rows_per_band = n_hashes // bands
    banded = (
        signatures.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
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
    a = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
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
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
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
