"""BFS hop labeling (graph.bfs_hops) + the word_graph_bfs query contract.

Exact small-case checks (hand-computable graphs), the max_hops bound,
and determinism of the query's root selection.
"""

from __future__ import annotations

import pytest

from mapreduce_big_data_processing_spark.operators import graph as G


@pytest.fixture()
def path_graph(spark):
    # a -- b -- c -- d -- e, plus isolated pair x -- y
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    return spark.createDataFrame(edges, "src string, dst string")


def _src(spark, node):
    return spark.createDataFrame([(node,)], "node string")


def test_bfs_hops_path_graph(spark, path_graph):
    got = {
        r.node: r.hops
        for r in G.bfs_hops(path_graph, _src(spark, "a"), max_hops=4).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_bfs_respects_max_hops_bound(spark, path_graph):
    got = {
        r.node: r.hops
        for r in G.bfs_hops(path_graph, _src(spark, "a"), max_hops=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}  # d, e beyond the bound


def test_bfs_unreached_component_excluded(spark, path_graph):
    nodes = {
        r.node
        for r in G.bfs_hops(path_graph, _src(spark, "x"), max_hops=4).collect()
    }
    assert nodes == {"x", "y"}  # the a..e chain is unreachable


def test_bfs_undirected_and_min_hop(spark):
    # direction of the input rows must not matter, and a node reachable
    # two ways gets the MINIMUM hop count: triangle a-b, b-c, c-a plus
    # tail c-d; every node is within 1-2 hops of a.
    edges = [("b", "a"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.hops
        for r in G.bfs_hops(df, _src(spark, "a"), max_hops=4).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_multi_source(spark, path_graph):
    srcs = spark.createDataFrame([("a",), ("e",)], "node string")
    got = {
        r.node: r.hops for r in G.bfs_hops(path_graph, srcs, max_hops=2).collect()
    }
    assert got == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}


def test_word_graph_bfs_query_root_is_deterministic(spark, sf_dir):
    from mapreduce_big_data_processing_spark import queries as Q

    a = {(r.node, r.hops) for r in Q.QUERIES["word_graph_bfs"](spark, sf_dir).collect()}
    b = {(r.node, r.hops) for r in Q.QUERIES["word_graph_bfs"](spark, sf_dir).collect()}
    assert a == b
    assert sum(1 for _, h in a if h == 0) == 1  # exactly one root


# --- property tests: BFS vs a pure-Python shortest-hop model -------------

from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EDGES = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=24,
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_bfs(edges, src, max_hops):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hops = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if hops[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in hops:
                hops[v] = hops[u] + 1
                dq.append(v)
    return hops


@_slow
@given(edges=_EDGES, data=st.data())
@pytest.mark.slow
def test_bfs_matches_python_model(spark, edges, data):
    src = data.draw(st.sampled_from(sorted({n for e in edges for n in e})))
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    sdf = spark.createDataFrame([(int(src),)], "node long")
    got = {r.node: r.hops for r in G.bfs_hops(df, sdf, max_hops=3).collect()}
    want = _py_bfs(edges, src, 3)
    # the model may include src even when its only edges are self-loops;
    # bfs_hops always emits the source at hop 0 too
    assert got == want


# --- SSSP (bounded Bellman-Ford, integer min-plus) ------------------------


def test_sssp_hand_worked(spark):
    # a -1- b -1- c, plus direct a -5- c and a dead-end d: shortest a->c
    # is 2 via b, not the direct 5-edge; d unreachable.
    edges = [("a", "b", 1), ("b", "a", 1), ("b", "c", 1), ("c", "b", 1),
             ("a", "c", 5), ("c", "a", 5), ("d", "e", 1), ("e", "d", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    srcdf = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.dist for r in G.sssp(df, srcdf, max_rounds=6).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_sssp_round_bound_truncates_paths(spark):
    # chain of weight-1 edges; max_rounds=2 reaches only 2 hops out
    edges = [(i, i + 1, 1) for i in range(6)] + [(i + 1, i, 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    srcdf = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in G.sssp(df, srcdf, max_rounds=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def _py_bellman(edges, src, rounds):
    dist = {src: 0}
    for _ in range(rounds):
        cur = dict(dist)
        for a, b, w in edges:
            if a in dist:
                nd = dist[a] + w
                if b not in cur or nd < cur[b]:
                    cur[b] = min(cur.get(b, nd), nd)
        if cur == dist:
            break
        dist = cur
    return dist


_WEDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9), st.integers(1, 7)),
    min_size=1,
    max_size=20,
)


@_slow
@given(edges=_WEDGES, data=st.data())
@pytest.mark.slow
def test_sssp_matches_python_model(spark, edges, data):
    src = data.draw(st.sampled_from(sorted({n for a, b, _ in edges for n in (a, b)})))
    # directed edges exactly as given (operator does not symmetrize)
    df = spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in edges], "src long, dst long, w long"
    )
    sdf = spark.createDataFrame([(int(src),)], "node long")
    got = {r.node: r.dist for r in G.sssp(df, sdf, max_rounds=4).collect()}
    want = _py_bellman(edges, src, 4)
    assert got == want
