"""Deterministic scale-up generator for the fixture schema.

The driver fixtures top out at sf0.1 (~17 MB) — enough for correctness,
useless for demonstrating the 100 TB posture (SCALE.md): at that size no
shuffle exceeds a few MB and every plan constant dominates. This tool
re-creates the same nine-table schema (plus a deliberately skewed events
variant for the skew-mitigation demo) at an arbitrary multiple of sf0.1,
entirely with JVM-side column expressions: `spark.range` + `xxhash64`-seeded
pseudo-uniforms. No Python in the row path, no RNG state — every cell is a
pure function of (row id, seed), so any subset regenerates identically and
generation parallelizes across all cores.

Usage:
    python tools_gen_scale.py <mult> <outdir>   # mult is relative to sf0.1
    python tools_gen_scale.py 10 scale_data/sf1

Value distributions mirror the driver fixtures (see TESTDATA.md) closely
enough that every registered query returns plausible, non-degenerate
results: same date ranges (events 2024-01-01..30 — forecast_rmse holds out
day 30), same categorical domains, ~8% planted exact/near duplicate
documents, ~2% planted near-duplicate embeddings with label-clustered
structure (same-label cosine ≈ 0.2 ≪ the 0.45 near-dup threshold, so the
planted-pair count stays LINEAR in n — an accidental quadratic pair set
would itself be a scale bug in the generator).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# sf0.1 row counts (TESTDATA.md); a run at mult=m scales each by m
BASE = {
    "region": 5,
    "nation": 25,
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

#: events.user_id domain at sf0.1 (distinct users, not customer keys)
BASE_USERS = 1_500

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "join", "shuffle", "plan", "cache",
    # marker words, same ~3%/word rate as the driver fixtures: quality
    # scoring needs stopword_ratio >= 0.01 and language-ID needs marker
    # hits — without them EVERY generated doc scored 0.8/'und' and the
    # curation pipelines' survivor sets were EMPTY at scale (caught in r4:
    # curated_training_set returned 0 rows on all generated fixtures, so
    # the r3 scale timings for it measured an empty tail, not the
    # pipeline)
    "a", "the",
]

SEGMENTS = ["BUILDING", "FURNITURE", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
PWORD1 = ["large", "hot", "blue", "old", "new", "dark", "pale", "spring"]
PWORD2 = ["ring", "bolt", "plate", "gear", "cap", "tube", "rod", "disk"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "en", "en", "en", "en", "zh", "de", "fr"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _u(seed: int, *cols: Column) -> Column:
    """Deterministic uniform double in [0, 1) from (cols..., seed)."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(1_000_000)) / 1.0e6


def _pick(options: list[str], seed: int, *cols: Column) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    h = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(len(options)))
    return F.element_at(arr, (h + 1).cast("int"))


def _ts_between(lo: str, hi: str, seed: int, *cols: Column) -> Column:
    """Deterministic timestamp in [lo, hi) with microsecond jitter."""
    t_lo = F.unix_timestamp(F.to_timestamp(F.lit(lo)))
    span = F.unix_timestamp(F.to_timestamp(F.lit(hi))) - t_lo
    sec = t_lo + F.floor(_u(seed, *cols) * span)
    micro = F.pmod(F.xxhash64(*cols, F.lit(seed + 1)), F.lit(1_000_000))
    return F.timestamp_micros((sec * 1_000_000 + micro).cast("long"))


def _range(spark: SparkSession, n: int) -> DataFrame:
    # ROW-based partitioning, not byte-based: narrow tables (embeddings,
    # documents) are compute-heavy per row downstream, and a single <128 MB
    # parquet file would hand Spark ONE input split — the r3 100× run
    # showed that serializing every Arrow stage over them. ~25k rows/file
    # keeps both generation and downstream scans parallel.
    parts = max(1, min(256, n // 25_000))
    return spark.range(0, n, 1, parts)


def gen_tables(spark: SparkSession, mult: float) -> dict[str, DataFrame]:
    n = {k: max(1, int(v * mult)) for k, v in BASE.items()}
    users = max(2, int(BASE_USERS * mult))
    i = F.col("id")

    # regions/nations are the fixed TPC-H-style dims — enumerate, don't hash
    region = spark.createDataFrame(
        [(k, name) for k, name in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    nation = _range(spark, 25).select(
        i.cast("int").alias("n_nationkey"),
        F.format_string("NATION_%d", i).alias("n_name"),
        (i % 5).cast("int").alias("n_regionkey"),
    )

    customer = _range(spark, n["customer"]).select(
        i.alias("c_custkey"),
        F.format_string("Customer#%09d", i).alias("c_name"),
        F.pmod(F.xxhash64(i, F.lit(101)), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u(102, i) * 10_000, 2).alias("c_acctbal"),
        _pick(SEGMENTS, 103, i).alias("c_mktsegment"),
    )

    supplier = _range(spark, n["supplier"]).select(
        i.alias("s_suppkey"),
        F.format_string("Supplier#%09d", i).alias("s_name"),
        F.pmod(F.xxhash64(i, F.lit(111)), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u(112, i) * 10_000, 2).alias("s_acctbal"),
    )

    part = _range(spark, n["part"]).select(
        i.alias("p_partkey"),
        F.concat_ws(" ", _pick(PWORD1, 121, i), _pick(PWORD2, 122, i)).alias("p_name"),
        F.format_string(
            "Brand#%d", F.pmod(F.xxhash64(i, F.lit(123)), F.lit(25)) + 1
        ).alias("p_brand"),
        _pick(PTYPES, 124, i).alias("p_type"),
        (F.pmod(F.xxhash64(i, F.lit(125)), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(i, F.lit(1000)) * 0.1, 2).alias("p_retailprice"),
    )

    orders = _range(spark, n["orders"]).select(
        i.alias("o_orderkey"),
        F.floor(_u(131, i) * n["customer"]).alias("o_custkey"),
        _pick(["O", "F", "P"], 132, i).alias("o_orderstatus"),
        F.round(_u(133, i) * 499_000 + 1_000, 2).alias("o_totalprice"),
        F.date_trunc("day", _ts_between("1995-01-01", "2001-08-02", 134, i)).alias(
            "o_orderdate"
        ),
        _pick(PRIORITIES, 135, i).alias("o_orderpriority"),
    )

    lineitem = _range(spark, n["lineitem"]).select(
        F.pmod(F.xxhash64(i, F.lit(141)), F.lit(n["orders"])).alias("l_orderkey"),
        F.floor(_u(142, i) * n["part"]).alias("l_partkey"),
        F.floor(_u(143, i) * n["supplier"]).alias("l_suppkey"),
        (F.pmod(i, F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.floor(_u(144, i) * 50) + 1).cast("double").alias("l_quantity"),
        F.round(_u(145, i) * 104_000 + 900, 2).alias("l_extendedprice"),
        F.round(_u(146, i) * 0.1, 2).alias("l_discount"),
        F.round(_u(147, i) * 0.08, 2).alias("l_tax"),
        _pick(["A", "N", "R"], 148, i).alias("l_returnflag"),
        _pick(["O", "F"], 149, i).alias("l_linestatus"),
        F.date_trunc("day", _ts_between("1995-01-02", "2001-11-05", 150, i)).alias(
            "l_shipdate"
        ),
    )

    events = _range(spark, n["events"]).select(
        i.alias("event_id"),
        _ts_between("2024-01-01", "2024-01-31", 151, i).alias("ts"),
        F.pmod(F.xxhash64(i, F.lit(152)), F.lit(users)).alias("user_id"),
        _pick(EVENT_TYPES, 153, i).alias("event_type"),
        # mostly uniform 0-100 with a sparse heavy tail to ~560 (fixture shape)
        F.round(
            F.when(_u(154, i) < 0.02, _u(155, i) * 560).otherwise(_u(156, i) * 100), 2
        ).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(F.xxhash64(i, F.lit(157)), F.lit(100))
        ).alias("props"),
    )

    # events with one pathological hot key: ~30% of all rows on user_id=0.
    # Same schema; used ONLY by the skew-mitigation demo in bench_scale.py.
    events_skew = _range(spark, n["events"]).select(
        i.alias("event_id"),
        _ts_between("2024-01-01", "2024-01-31", 161, i).alias("ts"),
        F.when(_u(162, i) < 0.30, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(i, F.lit(163)), F.lit(users)))
        .alias("user_id"),
        _pick(EVENT_TYPES, 164, i).alias("event_type"),
        F.round(_u(165, i) * 100, 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(F.xxhash64(i, F.lit(166)), F.lit(100))
        ).alias("props"),
    )

    # documents: ~8% of rows re-derive their text from an earlier base doc
    # (half byte-identical for exact dedup, half one-word-appended for
    # near-dedup); the rest are unique. Pair count stays linear in n.
    ndoc = n["documents"]
    nuniq = max(1, int(ndoc * 0.92))
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    base = F.when(
        (_u(171, i) < 0.08) & (i >= 100),
        F.pmod(F.xxhash64(i, F.lit(172)), F.lit(nuniq)),
    ).otherwise(i)
    nwords = (F.pmod(F.xxhash64(base, F.lit(173)), F.lit(51)) + 10).cast("int")
    # ~20% of tokens come from an ENTITY domain that scales with the
    # corpus (e0..e<ndoc/5>): a closed 32-word vocab has a CLOSED 3-shingle
    # space (~32k), so any fixed fraction of docs designated as the eval
    # set covers most of it once the corpus is ~10× — and decontamination
    # then flags EVERY doc as contaminated (r4 finding: curated survivor
    # set was empty on all generated fixtures). Real corpora grow their
    # shingle space with size; the entity tokens reproduce that, keeping
    # per-doc benchmark overlap scale-stable.
    # SPARK_GRAFT_ENT_SHAPE controls how the entity domain grows with the
    # corpus. Default "linear" (ndoc/5) maximizes realistic DUP-rate
    # behavior but makes vocabulary-bounded stages (the word graph's node
    # and edge sets) look superlinear in corpus size — a fixture artifact,
    # not a plan property. A float value (e.g. "0.7") switches to a
    # Heaps-law shape, vocab ≈ (ndoc/5)^k: real corpora grow types
    # sublinearly in tokens (Heaps' law, k≈0.4-0.7), so this variant is
    # the one that answers "is the word-graph edge build superlinear on
    # realistic data?" (r4 verdict ask #4). Same seeds otherwise — only
    # the entity-id modulus changes.
    shape = os.environ.get("SPARK_GRAFT_ENT_SHAPE", "linear")
    if shape == "linear":
        ent_dom = max(ndoc // 5, 100)
    else:
        ent_dom = max(int((ndoc / 5) ** float(shape)), 100)
    words = F.transform(
        F.sequence(F.lit(1), nwords),
        lambda x: F.when(
            F.pmod(F.xxhash64(base, x, F.lit(178)), F.lit(5)) == 0,
            F.format_string(
                "e%d", F.pmod(F.xxhash64(base, x, F.lit(179)), F.lit(ent_dom))
            ),
        ).otherwise(
            F.element_at(
                vocab_arr,
                (F.pmod(F.xxhash64(base, x, F.lit(174)), F.lit(len(VOCAB))) + 1).cast(
                    "int"
                ),
            )
        ),
    )
    text = F.concat_ws(" ", words)
    near = (base != i) & (F.pmod(F.xxhash64(i, F.lit(175)), F.lit(2)) == 0)
    text = F.when(near, F.concat(text, F.lit(" near"))).otherwise(text)
    documents = _range(spark, ndoc).select(
        i.alias("doc_id"),
        text.alias("text"),
        _pick(LANGS, 176, base).alias("lang"),
        F.format_string("src%d", F.pmod(F.xxhash64(base, F.lit(177)), F.lit(20))).alias(
            "source"
        ),
        F.length(text).cast("bigint").alias("n_chars"),
    )

    # embeddings: 64-d, weakly label-clustered (centroid comps U(-.125,.125)
    # vs U(-.5,.5) noise -> same-label cosine ≈ 0.06) plus ~2% planted
    # near-duplicates (base vector + 1% jitter). NOTE: 64-d iid data has an
    # irreducible random cosine tail (P[cos>0.45] ≈ 1e-4 regardless of
    # bias), so near-dup PAIR counts grow ~n²·1e-4 at a fixed threshold —
    # a property of low-dim random data, measured and reported in
    # BENCH_SCALE.md rather than hidden by a tuned threshold.
    nemb = n["embeddings"]
    nuniq_e = max(1, int(nemb * 0.98))
    ebase = F.when(
        (_u(181, i) < 0.02) & (i >= 100),
        F.pmod(F.xxhash64(i, F.lit(182)), F.lit(nuniq_e)),
    ).otherwise(i)
    label = F.pmod(F.xxhash64(ebase, F.lit(183)), F.lit(10)).cast("int")
    dims = F.sequence(F.lit(0), F.lit(63))
    vec = F.transform(
        dims,
        lambda d: (
            (F.pmod(F.xxhash64(label, d, F.lit(184)), F.lit(1000)) / 4000.0 - 0.125)
            + (F.pmod(F.xxhash64(ebase, d, F.lit(185)), F.lit(1000)) / 1000.0 - 0.5)
            + F.when(
                ebase != i,
                F.pmod(F.xxhash64(i, d, F.lit(186)), F.lit(1000)) / 50_000.0 - 0.01,
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    embeddings = _range(spark, nemb).select(
        i.alias("vec_id"), vec.alias("embedding"), label.alias("label")
    )

    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "events_skew": events_skew,
        "documents": documents,
        "embeddings": embeddings,
    }


def main() -> None:
    mult = float(sys.argv[1])
    outdir = os.path.abspath(sys.argv[2])
    # optional third arg: comma-separated table subset (e.g.
    # "documents,embeddings" for the 1000x dedup/curation sweep — the
    # relational tables are not needed there and dominate generation time)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    from mapreduce_big_data_processing_spark.session import get_session

    spark = get_session("gen-scale", adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name, df in gen_tables(spark, mult).items():
        if only is not None and name not in only:
            continue
        path = os.path.join(outdir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
