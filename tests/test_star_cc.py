"""Large-star/small-star connected components (graph.connected_components_star).

The alternating-star algorithm (Kiveris et al., SoCC'14) must return the
SAME (node, comp=component-minimum) table as the hash-min loop — the two
are interchangeable behind one contract — while converging in O(log² n)
rounds regardless of graph diameter. Checks: golden graph, a path deeper
than hash-min's default round budget, self-loops/isolated nodes, exact
hash-min parity, and a hypothesis property test against a pure-Python
union-find model (the test_graph_bfs.py pattern: model-checking catches
semantics drift that fixture parity can't).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_big_data_processing_spark.operators import graph as G


def _star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.comp for r in G.connected_components_star(df, **kw).collect()}


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.slow
def test_star_cc_golden(spark):
    # same handmade graph as the hash-min golden: 4-path + triangle + pair
    got = _star(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@pytest.mark.slow
def test_star_cc_deep_path(spark):
    # a 64-hop path: hash-min needs 64 rounds (its default budget is 20);
    # the star alternation collapses it within its log²-scale budget
    n = 65
    got = _star(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


@pytest.mark.slow
def test_star_cc_unconverged_raises(spark):
    # an exhausted max_iter must RAISE, not return labels that are merely
    # closer to the minima than the input (r7 ADVICE: a partial result
    # must not masquerade as the oracle-checked fixpoint)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint within max_iter"):
        G.connected_components_star(df, max_iter=1)


@pytest.mark.slow
def test_star_cc_self_loops_and_isolated(spark):
    # a node seen only in a self-loop is a singleton component of itself
    got = _star(spark, [(5, 5), (1, 2)])
    assert got == {5: 5, 1: 1, 2: 1}


@pytest.mark.slow
def test_star_cc_matches_hash_min(spark):
    edges = [(1, 7), (7, 3), (3, 9), (2, 8), (8, 2), (4, 4), (10, 11), (11, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    star = {r.node: r.comp for r in G.connected_components_star(df).collect()}
    hmin = {r.node: r.comp for r in G.connected_components(df).collect()}
    assert star == hmin


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_star_cc_property_vs_union_find(spark, edges):
    assert _star(spark, edges) == _union_find(edges)
