"""Spectral primitives: gram_matrix + top_principal_component (ml.py).

Protocol guards for the `embedding_gram_matrix` / `embedding_top_pc`
oracles: exact small-case algebra, determinism across parallelism, and
round-half-boundary margins (the float-rounding protocol — measured
headroom at the shipped decimals is ~1000× the cross-engine
summation-order noise at every fixture SF; these assertions keep a
constant change from silently regressing it).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreduce_big_data_processing_spark import catalog
from mapreduce_big_data_processing_spark.operators import ml as ML

VEC_SCHEMA = "vec_id long, embedding array<double>"


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [0.5, -1.0])], VEC_SCHEMA
    )


def test_gram_matrix_exact(spark, tiny):
    got = {(r.i, r.j): r.g for r in ML.gram_matrix(tiny, "embedding").collect()}
    # G = Σ v·vᵀ over the three rows, upper triangle
    assert got == {
        (0, 0): 1.0 + 9.0 + 0.25,
        (0, 1): 2.0 + 12.0 - 0.5,
        (1, 1): 4.0 + 16.0 + 1.0,
    }


def test_gram_matrix_matches_numpy_on_fixture(spark, sf_dir):
    emb = catalog.load(spark, "embeddings", sf_dir)
    rows = ML.gram_matrix(emb, "embedding").collect()
    X = np.vstack(
        [np.asarray(r[0], dtype="float64") for r in emb.select("embedding").collect()]
    )
    ref = X.T @ X
    worst = max(
        abs(r.g - ref[r.i, r.j]) / max(1.0, abs(ref[r.i, r.j])) for r in rows
    )
    assert len(rows) == X.shape[1] * (X.shape[1] + 1) // 2
    assert worst < 1e-9  # summation-order noise only


def test_top_pc_matches_numpy_replay(spark, tiny):
    """The operator is a deterministic recurrence on the rounded Gram
    matrix — replay it locally and expect near-identity."""
    got = {r.vec_id: r.pc1 for r in
           ML.top_principal_component(tiny, "embedding", "vec_id", iters=12).collect()}
    X = np.array([[1.0, 2.0], [3.0, 4.0], [0.5, -1.0]])
    G = np.round(X.T @ X, 6)
    v = np.ones(2)
    for _ in range(12):
        w = G @ v
        v = w / np.sqrt(w @ w)
    ref = X @ v
    for k, vid in enumerate([1, 2, 3]):
        assert got[vid] == pytest.approx(ref[k], abs=1e-12)


def test_top_pc_deterministic_across_parallelism(spark, sf_dir):
    emb = catalog.load(spark, "embeddings", sf_dir)
    a = {r.vec_id: r.pc1 for r in
         ML.top_principal_component(emb.coalesce(1), "embedding", "vec_id").collect()}
    b = {r.vec_id: r.pc1 for r in
         ML.top_principal_component(emb.repartition(16), "embedding", "vec_id").collect()}
    worst = max(abs(a[k] - b[k]) for k in a)
    assert worst < 1e-9  # power iteration contracts partial-agg noise


def _min_boundary_margin(vals, decimals):
    """Distance of each |value|·10^decimals from the nearest .5 rounding
    boundary, in units of the last rounded digit."""
    x = np.abs(np.asarray(vals, dtype="float64")) * 10.0**decimals
    return float(np.min(np.abs(x - np.floor(x) - 0.5)))


def test_oracle_rounding_margins(spark, sf_dir):
    """Shipped decimals: gram rounded at 4 (output) and 6 (iteration
    input), projections at 4. Cross-engine noise is ~1e-7 of a digit;
    require ≥1e-5 so the hash protocol keeps ≥100× headroom (measured
    minima: 1.4e-4 … 1.9e-3 across sf0.001/0.01/0.1)."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    g = [r.g for r in ML.gram_matrix(emb, "embedding").collect()]
    pc = [r.pc1 for r in
          ML.top_principal_component(emb, "embedding", "vec_id", 12, 6).collect()]
    assert _min_boundary_margin(g, 4) > 1e-5
    assert _min_boundary_margin(g, 6) > 1e-5
    assert _min_boundary_margin(pc, 4) > 1e-5
