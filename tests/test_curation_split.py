"""leakage_free_split + quality_canonical_survivors behavioral guards."""

from __future__ import annotations

import pytest

from mapreduce_big_data_processing_spark import queries as Q


def _clusters(spark, sf_dir):
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.operators import dedup as D
    from mapreduce_big_data_processing_spark.operators import graph as G

    docs = catalog.load(spark, "documents", sf_dir)
    sh = D.shingles(docs, k=3).cache()
    sig = D.minhash_signatures(sh, n_hashes=16, portable=True)
    cand = D.lsh_candidate_pairs(sig, n_hashes=16, bands=4)
    pairs = D.jaccard_pairs(sh, min_jaccard=0.5, candidates=cand)
    comp = G.connected_components(pairs, src="id_a", dst="id_b")
    out = {}
    for r in comp.collect():
        out.setdefault(r.comp, set()).add(r.node)
    return out


@pytest.mark.slow
def test_split_never_straddles_a_cluster(spark, sf_dir):
    split = {
        r.doc_id: r.split
        for r in Q.QUERIES["leakage_free_split"](spark, sf_dir).collect()
    }
    clusters = _clusters(spark, sf_dir)
    assert clusters  # fixture has near-dup clusters
    for members in clusters.values():
        assert len({split[d] for d in members}) == 1, members
    assert {"train", "heldout"} == set(split.values())  # both sides hit


@pytest.mark.slow
def test_canonical_is_cluster_quality_argmax(spark, sf_dir):
    from mapreduce_big_data_processing_spark import catalog
    from mapreduce_big_data_processing_spark.operators import textstats as TS

    docs = catalog.load(spark, "documents", sf_dir)
    q = {r.doc_id: r.quality for r in TS.quality_score(docs).collect()}
    clusters = _clusters(spark, sf_dir)
    rows = Q.QUERIES["quality_canonical_survivors"](spark, sf_dir).collect()
    assert len(rows) == len(clusters)
    for r in rows:
        members = clusters[r.cluster_id]
        assert r.doc_id in members
        best = max(q[d] for d in members)
        assert r.quality == best == q[r.doc_id]
        # tie-break: smallest id among the best-quality members
        assert r.doc_id == min(d for d in members if q[d] == best)


def test_winsorized_stats_bounds_and_mean(spark, sf_dir):
    from mapreduce_big_data_processing_spark import catalog

    rows = Q.QUERIES["winsorized_event_stats"](spark, sf_dir).collect()
    assert rows
    ev = catalog.load(spark, "events", sf_dir).select("event_type", "value").collect()
    vals = {}
    for r in ev:
        vals.setdefault(r.event_type, []).append(round(r.value * 100))
    for r in rows:
        s = sorted(vals[r.event_type])
        assert r.n == len(s)
        assert r.lo_cents in s and r.hi_cents in s  # bounds are DATA values
        assert r.lo_cents <= r.hi_cents
        # clipped mean replayed in Python from the same integers
        clipped = [min(max(c, r.lo_cents), r.hi_cents) for c in s]
        assert r.winsorized_mean == round(sum(clipped) / (len(s) * 100.0), 6)


def test_q8_share_bounds_and_consistency(spark, sf_dir):
    rows = Q.QUERIES["supplier_mkt_share_by_year"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.market_revenue > 0


def test_lang_agreement_matrix_partitions_corpus(spark, sf_dir):
    from mapreduce_big_data_processing_spark import catalog

    rows = Q.QUERIES["lang_label_agreement"](spark, sf_dir).collect()
    total = catalog.load(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == total  # every doc in one cell


@pytest.mark.slow
def test_dedup_savings_consistent_with_clusters(spark, sf_dir):
    rows = Q.QUERIES["dedup_savings_report"](spark, sf_dir).collect()
    clusters = _clusters(spark, sf_dir)
    assert sum(r.n_clusters for r in rows) == len(clusters)
    assert sum(r.docs_removed for r in rows) == sum(
        len(m) - 1 for m in clusters.values()
    )
    for r in rows:
        assert r.cluster_size >= 2  # singletons never enter the pair graph
        assert r.docs_removed == r.n_clusters * (r.cluster_size - 1)
