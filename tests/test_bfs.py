"""Multi-source k-hop BFS: hop-layer semantics vs handcrafted graphs and
a networkx oracle on a random graph."""

from __future__ import annotations

import random

from kg_microbe_merge_spark.operators.bfs import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["subject", "object"])


def _srcs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


def _dists(df):
    return {r["id"]: r["dist"] for r in df.collect()}


def test_chain_directed(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = _dists(bfs_distances(e, _srcs(spark, ["a"]), max_hops=3))
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is 4 hops: excluded


def test_multi_source_min_and_undirected(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("e", "d"), ("d", "c")])
    # directed from {a, e}: c reached at dist 2 via both arms
    out = _dists(bfs_distances(e, _srcs(spark, ["a", "e"]), max_hops=5))
    assert out == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}
    # undirected from {c}: both arms walkable backwards
    out = _dists(
        bfs_distances(e, _srcs(spark, ["c"]), max_hops=2, directed=False)
    )
    assert out == {"c": 0, "b": 1, "d": 1, "a": 2, "e": 2}


def test_early_exit_and_isolated_source(spark):
    e = _edges(spark, [("a", "b")])
    # source not in the graph at all: just itself at dist 0
    out = _dists(bfs_distances(e, _srcs(spark, ["z"]), max_hops=10))
    assert out == {"z": 0}


def test_random_graph_matches_networkx(spark):
    import networkx as nx

    rng = random.Random(11)
    n = 60
    pairs = list(
        {
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(150)
        }
    )
    pairs = [(s, d) for s, d in pairs if s != d]
    g = nx.DiGraph(pairs)
    seeds = ["n0", "n7", "n13"]
    for s in seeds:
        g.add_node(s)
    k = 4
    want = {}
    for s in seeds:
        for node, dist in nx.single_source_shortest_path_length(g, s, cutoff=k).items():
            want[node] = min(want.get(node, k + 1), dist)
    got = _dists(bfs_distances(_edges(spark, pairs), _srcs(spark, seeds), max_hops=k))
    assert got == want
