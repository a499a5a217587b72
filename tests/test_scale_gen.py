"""tools_gen_scale output must be drop-in compatible with the fixtures.

Every registered query takes an sf_dir; the scale-stress story
(BENCH_SCALE.md) only holds if generated tables are schema-identical to
the driver fixtures and their planted structure (duplicates, hot keys,
date ranges) is actually present.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools_gen_scale import BASE, gen_tables  # noqa: E402


@pytest.fixture(scope="module")
def gen(spark):
    return gen_tables(spark, 0.05)


def test_schemas_match_fixtures(spark, sf_dir, gen):
    from mapreduce_big_data_processing_spark import catalog

    def norm(d):
        # fixture parquet surfaces TIMESTAMP(NANOS/MICROS) as timestamp_ntz;
        # the generator emits timestamp — identical under the pinned UTC zone
        return {k: ("timestamp" if v == "timestamp_ntz" else v) for k, v in d.items()}

    for name in BASE:
        fixture = catalog.load(spark, name, sf_dir)
        got = norm(dict(gen[name].dtypes))
        want = norm(dict(fixture.dtypes))
        assert got == want, f"{name}: {got} != {want}"


def test_row_counts_scale(gen):
    assert gen["lineitem"].count() == int(600_000 * 0.05)
    assert gen["documents"].count() == int(5_000 * 0.05)
    # dims don't scale
    assert gen["region"].count() == 5
    assert gen["nation"].count() == 25


def test_documents_have_planted_duplicates(gen):
    docs = gen["documents"]
    n = docs.count()
    distinct = docs.select("text").distinct().count()
    # ~8% derive from a base doc; half byte-identical -> 2-6% collapse
    assert 0.01 * n < (n - distinct) < 0.10 * n


def test_events_cover_forecast_window(gen):
    lo, hi = gen["events"].agg(F.min("ts"), F.max("ts")).first()
    assert str(lo) < "2024-01-02" and "2024-01-30" < str(hi) < "2024-01-31"


def test_skew_table_has_hot_key(gen):
    ev = gen["events_skew"]
    total = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()
    assert 0.25 * total < hot < 0.35 * total


def test_determinism(spark, gen):
    again = gen_tables(spark, 0.05)
    a = sorted(gen["documents"].select("doc_id", "text").collect())
    b = sorted(again["documents"].select("doc_id", "text").collect())
    assert a == b


def test_embedding_near_dup_pairs_linearish(gen):
    """Planted near-dups dominate; the random cosine tail at 64-d adds
    ~1e-4 of all pairs — with n=100 here both terms are tiny."""
    emb = gen["embeddings"]
    assert emb.count() == 100
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64]
