"""Densest subgraph by distributed greedy peeling
(operators/densest.py): python-twin equality, clique recovery,
DuckDB-twin equality, guards."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.densest import (
    PeelDepthExceeded,
    densest_sql,
    densest_subgraph,
)


def _twin(edge_list):
    """Pure-python model of the identical peel (eps = 1/2, integer
    protocol): returns (node_set, density_micro, v, e)."""
    g = {tuple(sorted(p)) for p in edge_list if p[0] != p[1]}
    removed = {}
    stats = []
    prev_nodes = None
    rnd = 0
    while True:
        deg = {}
        for a, b in g:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        if prev_nodes is not None:
            for n in prev_nodes - set(deg):
                removed[n] = rnd - 1  # last round present
        v, e = len(deg), len(g)
        if v == 0:
            break
        stats.append((rnd, v, e))
        drop = {n for n, d in deg.items() if d * v <= 3 * e}
        prev_nodes = set(deg)
        g = {(a, b) for a, b in g if a not in drop and b not in drop}
        rnd += 1
    if not stats:
        return set(), None, 0, 0
    best_rnd, bv, be = max(
        stats, key=lambda s: ((1_000_000 * s[2] + s[1] // 2) // s[1], -s[0])
    )
    micro = (1_000_000 * be + bv // 2) // bv
    return (
        {n for n, r in removed.items() if r >= best_rnd},
        micro, bv, be,
    )


def _df(spark, edge_list):
    return spark.createDataFrame(
        [(a, b) for a, b in edge_list], "subject string, object string"
    )


def _clique_plus_chain():
    clique = [(f"k{i}", f"k{j}") for i in range(10) for j in range(i + 1, 10)]
    chain = [("k0", "c0")] + [(f"c{i}", f"c{i+1}") for i in range(19)]
    return clique + chain


def test_recovers_dense_clique(spark):
    out = densest_subgraph(_df(spark, _clique_plus_chain())).collect()
    assert {r["node"] for r in out} == {f"k{i}" for i in range(10)}
    assert all(r["density_micro"] == 4_500_000 for r in out)
    assert all((r["n_nodes"], r["n_edges"]) == (10, 45) for r in out)


def test_python_twin_random_graph(spark):
    rng = random.Random(7)
    edges = {(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
             for _ in range(260)}
    edges = [e for e in edges if e[0] != e[1]]
    want_nodes, want_micro, wv, we = _twin(edges)
    out = densest_subgraph(_df(spark, edges)).collect()
    assert {r["node"] for r in out} == want_nodes
    assert all(r["density_micro"] == want_micro for r in out)
    assert all((r["n_nodes"], r["n_edges"]) == (wv, we) for r in out)


def test_duckdb_twin_random_graph(spark):
    rng = random.Random(11)
    edges = sorted({(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
                    for _ in range(150)})
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    sql = densest_sql(
        f"SELECT a AS src, b AS dst FROM (VALUES {vals}) t(a, b)",
        rounds=20,
    )
    oracle = {
        (r[0], r[1], r[2], r[3])
        for r in duckdb.sql(sql).fetchall()
    }
    got = {
        (r["node"], r["density_micro"], r["n_nodes"], r["n_edges"])
        for r in densest_subgraph(_df(spark, edges)).collect()
    }
    assert got == oracle and got


def test_isolated_by_removal_nodes_stay_in_their_subgraphs(spark):
    # star: hub survives round 0's threshold but loses every neighbor,
    # leaving the graph by isolation at round 1 — it MUST still appear
    # in the round-0 subgraph (the best one here: whole graph)
    edges = [("hub", f"leaf{i}") for i in range(3)]
    out = densest_subgraph(_df(spark, edges)).collect()
    want_nodes, want_micro, wv, we = _twin(edges)
    assert {r["node"] for r in out} == want_nodes
    assert want_nodes == {"hub", "leaf0", "leaf1", "leaf2"}
    assert all(r["density_micro"] == want_micro == 750_000 for r in out)
    assert (wv, we) == (4, 3)


def test_self_loops_and_duplicates_ignored(spark):
    base = _clique_plus_chain()
    noisy = base + [("k0", "k0"), ("k1", "k2"), ("k2", "k1")]
    got = {r["node"] for r in densest_subgraph(_df(spark, noisy)).collect()}
    assert got == {f"k{i}" for i in range(10)}


def test_empty_input(spark):
    out = densest_subgraph(_df(spark, []))
    assert out.count() == 0
    assert out.columns == ["node", "density_micro", "n_nodes", "n_edges"]


def test_depth_guard(spark):
    with pytest.raises(PeelDepthExceeded):
        densest_subgraph(_df(spark, [("a", "b")]), max_rounds=0)


def test_gate_graph_peel_depth_within_oracle_unroll():
    # driver gate runs at sf0.01 with a 40-round unrolled oracle; the
    # twin measures actual depth there (depth grows ~log_1.5(V), so
    # sf0.1 adds ~6 rounds at most — far under 40)
    import duckdb as d

    edges = d.sql(
        "SELECT DISTINCT 'O' || l_orderkey, 'S' || l_suppkey "
        "FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    ).fetchall()
    g = {tuple(sorted(p)) for p in edges}
    rounds = 0
    while g:
        deg = {}
        for a, b in g:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        v, e = len(deg), len(g)
        drop = {n for n, dd in deg.items() if dd * v <= 3 * e}
        g = {(a, b) for a, b in g if a not in drop and b not in drop}
        rounds += 1
    assert rounds <= 40, f"gate peel depth {rounds} exceeds oracle unroll"
