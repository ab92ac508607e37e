"""Sampled bounded-hop betweenness (operators/betweenness.py):
python/DuckDB twin equality, networkx cross-checks, broker detection,
guards."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.betweenness import (
    betweenness_centrality,
    betweenness_py,
    betweenness_sql,
)


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _collect(spark, edges, **kw):
    return {
        r["node"]: r["bc_micro"]
        for r in betweenness_centrality(_df(spark, edges), **kw).collect()
    }


def test_chain_broker_hand_values(spark):
    # a -> b -> c: all sources, enough hops; b brokers exactly the
    # a→c path: delta_a(b) = 1 → bc_micro(b) = 1_000_000
    edges = [("a", "b"), ("b", "c")]
    got = _collect(spark, edges, k_sources=3, max_hops=3)
    assert got == betweenness_py(edges, 3, 3)
    assert got["b"] == 1_000_000
    assert got["c"] == 0


def test_exact_vs_networkx_unique_paths(spark):
    # directed tree + cross edges with UNIQUE shortest paths
    # (sigma = 1 everywhere → per-term floors are exact): all-source
    # bounded-hop bc equals networkx exactly
    nx = pytest.importorskip("networkx")
    rng = random.Random(6)
    g = nx.random_labeled_tree(14, seed=3)
    edges = [(f"n{a}", f"n{b}") for a, b in g.edges()]
    edges += [(f"n{b}", f"n{a}") for a, b in g.edges()]
    dg = nx.DiGraph(edges)
    want = nx.betweenness_centrality(dg, normalized=False)
    got = betweenness_py(edges, k_sources=28, max_hops=14)
    for n, bc in want.items():
        assert abs(got.get(n, 0) / 1_000_000 - bc) < 1e-9, n


def test_networkx_approx_with_shared_paths(spark):
    # diamond-ish graph with sigma > 1: floors accumulate < 1e-3
    nx = pytest.importorskip("networkx")
    rng = random.Random(11)
    edges = sorted({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                    for _ in range(40)})
    edges = [e for e in edges if e[0] != e[1]]
    dg = nx.DiGraph(edges)
    want = nx.betweenness_centrality(dg, normalized=False)
    got = betweenness_py(edges, k_sources=12, max_hops=12)
    for n in dg.nodes():
        assert abs(got.get(n, 0) / 1_000_000 - want[n]) < 1e-3, n


def test_spark_matches_python_twin(spark):
    rng = random.Random(21)
    edges = sorted({(f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
                    for _ in range(60)})
    edges = [e for e in edges if e[0] != e[1]]
    got = _collect(spark, edges, k_sources=6, max_hops=4)
    assert got == betweenness_py(edges, 6, 4) and got


def test_duckdb_twin(spark):
    rng = random.Random(2)
    edges = sorted({(f"n{rng.randrange(15)}", f"n{rng.randrange(15)}")
                    for _ in range(45)})
    edges = [e for e in edges if e[0] != e[1]]
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    sql = betweenness_sql(
        f"SELECT a AS src, b AS dst FROM (VALUES {vals}) t(a, b)",
        k_sources=5, max_hops=3,
    )
    want = dict(duckdb.sql(sql).fetchall())
    got = _collect(spark, edges, k_sources=5, max_hops=3)
    assert got == want and got


def test_overlapping_equal_depth_bfs_trees(spark):
    # adversarial for the backward-sweep self-joins: three sources
    # whose BFS trees OVERLAP at equal depths (s1/s2/s3 all reach m1/m2
    # at dist 1 and t at dist 2, with sigma(t) = 2 per source). If the
    # (source, node) join keys ever degenerate to a trivially-true
    # self-comparison, dependencies leak across sources here and the
    # totals diverge from the python/networkx twins.
    edges = []
    for s in ("s1", "s2", "s3"):
        edges += [(s, "m1"), (s, "m2")]
    edges += [("m1", "t"), ("m2", "t"), ("t", "u")]
    srcs = spark.createDataFrame([("s1",), ("s2",), ("s3",)], "s string")
    got = {
        r["node"]: r["bc_micro"]
        for r in betweenness_centrality(
            _df(spark, edges), sources=srcs, max_hops=4
        ).collect()
    }
    assert got == betweenness_py(edges, sources=["s1", "s2", "s3"],
                                 max_hops=4)
    # per source s: delta(t) = (sigma_t/sigma_u)·(1+delta_u) = 1,
    # delta(m_i) = (1/2)·(1+delta_t) = 1, delta(u) = 0 — summed over
    # the 3 sources. Cross-source leakage (the trivially-true-join
    # failure mode) would inflate t/m1/m2 above 3.0.
    assert got["m1"] == 3_000_000
    assert got["m2"] == 3_000_000
    assert got["t"] == 3_000_000
    assert got.get("u", 0) == 0


def test_explicit_sources_and_guards(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    srcs = spark.createDataFrame([("a",)], "s string")
    got = {
        r["node"]: r["bc_micro"]
        for r in betweenness_centrality(
            _df(spark, edges), sources=srcs, max_hops=3
        ).collect()
    }
    assert got == betweenness_py(edges, sources=["a"], max_hops=3)
    # b brokers a→c and a→d; c brokers a→d (delta_c = 1, delta_b = 2)
    assert got["b"] == 2_000_000 and got["c"] == 1_000_000
    with pytest.raises(ValueError, match="max_hops"):
        betweenness_centrality(_df(spark, edges), max_hops=0)
    with pytest.raises(ValueError, match="k_sources"):
        betweenness_centrality(_df(spark, edges), k_sources=0)
