"""Unit tests for the graph scoring operators (operators/graph.py)."""

from pyspark.sql import functions as F  # noqa: F401

from data_pipeline_eng_project_1_spark.operators import graph


def _pagerank_reference(n_nodes, edges, iters=4, d=0.85):
    """Sequential mirror of the absorbing-form recurrence."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {v: 1.0 / n_nodes for v in range(n_nodes)}
    for _ in range(iters):
        contrib = defaultdict(float)
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        r = {v: (1.0 - d) / n_nodes + d * contrib.get(v, 0.0)
             for v in range(n_nodes)}
    return r


def test_pagerank_matches_reference_on_known_graph(spark):
    """Star-into-0 plus a chain plus a dangling node: the distributed
    joins must reproduce the sequential recurrence, the celebrity node 0
    must outrank everything, and the isolated node 5 must sit at the
    no-inlinks floor (1-d)/N."""
    n = 6
    edges = [(1, 0), (2, 0), (3, 0), (3, 4), (4, 0), (0, 1), (1, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"]
           for r in graph.pagerank(nodes, e, iters=4).collect()}
    want = _pagerank_reference(n, edges, iters=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert got[0] == max(got.values())        # celebrity
    assert abs(got[5] - 0.15 / n) < 1e-12     # isolated node at the floor


def test_pagerank_random_graphs_match_reference(spark):
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        n = 20
        edges = sorted({(rng.randrange(n), rng.randrange(n))
                        for _ in range(50)})
        edges = [(s, t) for s, t in edges if s != t]
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        e = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["id"]: r["rank"]
               for r in graph.pagerank(nodes, e, iters=4).collect()}
        want = _pagerank_reference(n, edges, iters=4)
        assert all(abs(got[v] - want[v]) < 1e-12 for v in want), seed


def test_pagerank_empty_nodes_raises(spark):
    import pytest

    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty node set"):
        graph.pagerank(nodes, edges)
