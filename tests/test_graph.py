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


def test_pagerank_stale_deg_column_is_ignored_unless_named(spark):
    """r17 contract (ADVICE r16): a column that happens to be called
    'deg' in the caller's edge frame is NOT silently trusted as the
    out-degree — only an explicit deg_col engages the skip. A stale/
    wrong deg must be ignored (recomputed) by default, and honored —
    reproducing the wrong ranks — only when named."""
    n = 4
    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    # attach a WRONG degree (all 7) to every edge row
    e_bad = spark.createDataFrame([(s, t, 7) for s, t in edges],
                                  ["src", "dst", "deg"])
    got = {r["id"]: r["rank"]
           for r in graph.pagerank(nodes, e_bad, iters=3).collect()}
    want = _pagerank_reference(n, edges, iters=3)
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)
    # named explicitly, the bogus degree IS used -> different ranks
    got_bad = {r["id"]: r["rank"]
               for r in graph.pagerank(nodes, e_bad, iters=3,
                                       deg_col="deg").collect()}
    assert any(abs(got_bad[v] - want[v]) > 1e-9 for v in want)
    import pytest

    with pytest.raises(ValueError, match="deg_col"):
        graph.pagerank(nodes, e_bad, iters=1, deg_col="nope")


def test_pagerank_empty_nodes_raises(spark):
    import pytest

    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty node set"):
        graph.pagerank(nodes, edges)


def _triangles_reference(edges):
    """Naive per-node triangle counts from an adjacency-set scan."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    return {v: (len(adj[v]), tri[v]) for v in adj}


def test_triangle_counts_known_graph(spark):
    """A 4-clique plus a pendant: clique nodes sit in C(3,2)=3 triangles,
    the pendant in none."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    e = spark.createDataFrame(edges, ["a", "b"])
    got = {r["id"]: (r["deg"], r["n_triangles"])
           for r in graph.triangle_counts(e).collect()}
    assert got == {0: (3, 3), 1: (3, 3), 2: (3, 3), 3: (4, 3), 4: (1, 0)}


def test_triangle_counts_random_graphs_match_reference(spark):
    """Degree-ordered wedge closure == brute-force enumeration, including
    graphs with heavy degree ties (the orientation's tiebreak path)."""
    import random

    for seed, n, m in ((7, 15, 40), (23, 12, 60), (42, 25, 50)):
        rng = random.Random(seed)
        edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                        for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        e = spark.createDataFrame(edges, ["a", "b"])
        got = {r["id"]: (r["deg"], r["n_triangles"])
               for r in graph.triangle_counts(e).collect()}
        assert got == _triangles_reference(edges), seed


def _link_prediction_reference(edges):
    """Naive common-neighbor/Jaccard scores for all non-adjacent
    distance-2 pairs, from adjacency sets."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for x, y in combinations(sorted(adj), 2):
        if y in adj[x]:
            continue
        common = len(adj[x] & adj[y])
        if common:
            out[(x, y)] = (common, common / len(adj[x] | adj[y]))
    return out


def test_link_prediction_known_graph(spark):
    """Path 0-1-2 plus hub 3 adjacent to all: (0,2) shares {1,3}; the
    already-adjacent pairs never appear."""
    edges = [(0, 1), (1, 2), (0, 3), (1, 3), (2, 3)]
    e = spark.createDataFrame(edges, ["a", "b"])
    got = {(r["a"], r["b"]): (r["common"], r["jaccard"])
           for r in graph.link_prediction_jaccard(e).collect()}
    # N(0)={1,3}, N(2)={1,3} -> common 2, union 2 -> jaccard 1.0
    assert got == {(0, 2): (2, 1.0)}


def test_link_prediction_random_graphs_match_reference(spark):
    import random

    for seed, n, m in ((5, 12, 25), (19, 16, 40)):
        rng = random.Random(seed)
        edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                        for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        e = spark.createDataFrame(edges, ["a", "b"])
        got = {(r["a"], r["b"]): (r["common"], round(r["jaccard"], 9))
               for r in graph.link_prediction_jaccard(e).collect()}
        want = {p: (c, round(j, 9))
                for p, (c, j) in _link_prediction_reference(edges).items()}
        assert got == want, seed
