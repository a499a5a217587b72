"""random_projection (JL) + cluster_balanced_sample behavioral guards."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark import queries as Q
from mapreduce_big_data_processing_spark.operators import similarity as S


def _vectors(spark, sf_dir, limit=40):
    emb = catalog.load(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(limit).collect()
    return {r.vec_id: np.asarray(r.embedding, dtype="float64") for r in rows}


def test_projection_matches_numpy(spark, sf_dir):
    planes = S.seeded_planes(n_planes=8, seed=7)
    emb = catalog.load(spark, "embeddings", sf_dir)
    got = {}
    for r in S.random_projection(emb, planes).collect():
        got.setdefault(r.vec_id, {})[r.j] = r.proj
    P = np.array(planes)
    for vid, v in _vectors(spark, sf_dir).items():
        ref = (P @ v) / math.sqrt(8)
        assert max(abs(got[vid][j] - ref[j]) for j in range(8)) < 1e-9


def test_projection_preserves_distance_ordering_in_expectation(spark, sf_dir):
    """JL property smoke check: the correlation between original and
    projected pairwise squared distances must be clearly positive. The
    bar is deliberately modest: the synthetic fixture's distances span
    only ~2x (squared 1.3-2.7 at sf0.001), so even a faithful 32-dim
    projection yields ~0.48 ordering correlation (measured) — the JL
    additive-error guarantee, not a rank guarantee; a broken projection
    (wrong matrix, dropped scaling, shuffled ids) lands near 0."""
    planes = S.seeded_planes(n_planes=32, seed=11)
    emb = catalog.load(spark, "embeddings", sf_dir)
    got = {}
    for r in S.random_projection(emb, planes).collect():
        got.setdefault(r.vec_id, [0.0] * 32)[r.j] = r.proj
    vecs = _vectors(spark, sf_dir, limit=25)
    ids = sorted(vecs)
    orig, proj = [], []
    for i in range(len(ids)):
        for k in range(i + 1, len(ids)):
            a, b = ids[i], ids[k]
            orig.append(float(np.sum((vecs[a] - vecs[b]) ** 2)))
            pa, pb = np.array(got[a]), np.array(got[b])
            proj.append(float(np.sum((pa - pb) ** 2)))
    corr = np.corrcoef(orig, proj)[0, 1]
    assert corr > 0.3, corr


def test_projection_long_form_complete(spark, sf_dir):
    planes = S.seeded_planes(n_planes=8, seed=7)
    emb = catalog.load(spark, "embeddings", sf_dir)
    n = emb.count()
    out = S.random_projection(emb, planes)
    assert out.count() == n * 8
    per_dim = {r.j: r.c for r in out.groupBy("j").count().withColumnRenamed("count", "c").collect()}
    assert per_dim == {j: n for j in range(8)}


def test_cluster_balanced_sample_quota_and_stability(spark, sf_dir):
    rows = Q.QUERIES["cluster_balanced_sample"](spark, sf_dir).collect()
    per = {}
    for r in rows:
        per[r.cid] = per.get(r.cid, 0) + 1
    assert per and all(c <= 8 for c in per.values())
    again = Q.QUERIES["cluster_balanced_sample"](spark, sf_dir).collect()
    assert {(r.vec_id, r.cid) for r in rows} == {(r.vec_id, r.cid) for r in again}

