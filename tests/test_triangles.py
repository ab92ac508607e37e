"""Triangle counting: handcrafted cliques + a networkx oracle on a
random graph (orientation-independent results)."""

from __future__ import annotations

import random

from kg_microbe_merge_spark.operators.triangles import triangle_counts, triangles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["subject", "object"])


def _counts(df):
    return {r["id"]: r["triangles"] for r in df.collect()}


def test_k3_and_k4(spark):
    k3 = [("a", "b"), ("b", "c"), ("c", "a")]
    assert _counts(triangle_counts(_edges(spark, k3))) == {"a": 1, "b": 1, "c": 1}
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    # K4: 4 triangles, each node in C(3,2)=3 of them
    assert triangles(_edges(spark, k4)).count() == 4
    assert _counts(triangle_counts(_edges(spark, k4))) == {n: 3 for n in nodes}


def test_triangle_free_and_duplicates(spark):
    # path + duplicate/reversed/self-loop edges: still zero triangles
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "a"), ("a", "b"), ("d", "d")]
    assert triangles(_edges(spark, e)).count() == 0
    assert _counts(triangle_counts(_edges(spark, e))) == {}


def test_random_graph_matches_networkx(spark):
    import networkx as nx

    rng = random.Random(23)
    n = 40
    pairs = list(
        {(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(260)}
    )
    pairs = [(s, d) for s, d in pairs if s != d]
    g = nx.Graph(pairs)
    want = {k: v for k, v in nx.triangles(g).items() if v > 0}
    got = _counts(triangle_counts(_edges(spark, pairs)))
    assert got == want
    total = triangles(_edges(spark, pairs)).count()
    assert total == sum(want.values()) // 3


def test_clustering_coefficients_networkx(spark):
    import math
    import random

    import networkx as nx

    from kg_microbe_merge_spark.operators.triangles import (
        clustering_coefficients,
    )

    rng = random.Random(21)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = list(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(70)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "subject string, object string")
    got = {
        r["id"]: (r["degree"], r["triangles"], r["coeff"])
        for r in clustering_coefficients(df).collect()
    }
    g = nx.Graph(edges)
    nxc = nx.clustering(g)
    nxt = nx.triangles(g)
    assert set(got) == set(g.nodes)
    for n in g.nodes:
        dd, tt, cc = got[n]
        assert dd == g.degree[n] and tt == nxt[n], n
        assert cc == math.floor(nxc[n] * 1e6 + 0.5) / 1e6, n
