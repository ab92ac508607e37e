"""Weighted SSSP (operators/sssp.py): hand-checked relaxation, the
bounded ≤max_hops-edge semantics, undirected mode, networkx Dijkstra
oracle on a random weighted digraph, and the DuckDB bounded-walk twin."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.sssp import (
    sssp,
    sssp_pred_sql,
    sssp_sql,
)

E = "subject string, object string, weight long"

ROWS = [
    ("a", "b", 4),
    ("a", "c", 1),
    ("c", "b", 1),
    ("b", "d", 1),
    ("c", "d", 10),
    ("x", "y", 2),  # disconnected from a
]


def _dist(df):
    return {r["id"]: r["dist"] for r in df.collect()}


def _src(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_hand_graph(spark):
    g = spark.createDataFrame(ROWS, E)
    got = _dist(sssp(g, _src(spark, "a"), max_hops=10))
    # b via c (1+1=2) beats direct (4); d via c,b (3) beats c,d (11)
    assert got == {"a": 0, "b": 2, "c": 1, "d": 3}


def test_bounded_hop_semantics(spark):
    g = spark.createDataFrame(ROWS, E)
    # with 1 hop only, b costs 4 (direct) and d is via b/c 2-edge: absent
    got = _dist(sssp(g, _src(spark, "a"), max_hops=1))
    assert got == {"a": 0, "b": 4, "c": 1}
    # 2 hops: b improves through c; d reachable at 4+1 / 1+10 / (c,b,d)=3 needs 3 edges
    got = _dist(sssp(g, _src(spark, "a"), max_hops=2))
    assert got == {"a": 0, "b": 2, "c": 1, "d": 5}
    assert _dist(sssp(g, _src(spark, "a"), max_hops=0)) == {"a": 0}
    with pytest.raises(ValueError):
        sssp(g, _src(spark, "a"), max_hops=-1)


def test_multi_source_and_undirected(spark):
    g = spark.createDataFrame(ROWS, E)
    got = _dist(sssp(g, _src(spark, "a", "x"), max_hops=10))
    assert got["x"] == 0 and got["y"] == 2 and got["d"] == 3
    und = _dist(
        sssp(g, _src(spark, "d"), max_hops=10, directed=False)
    )
    # d-b 1, then b-c 1 (2), then c-a 1 (3); x/y stay unreachable
    assert und == {"d": 0, "b": 1, "c": 2, "a": 3}


def test_negative_weight_bounded(spark):
    g = spark.createDataFrame(
        [("a", "b", 5), ("a", "c", 10), ("b", "c", -8)], E
    )
    got = _dist(sssp(g, _src(spark, "a"), max_hops=5))
    assert got == {"a": 0, "b": 5, "c": -3}


def test_predecessors(spark):
    g = spark.createDataFrame(ROWS, E)
    got = {
        r["id"]: (r["dist"], r["pred"])
        for r in sssp(
            g, _src(spark, "a"), max_hops=10, with_predecessor=True
        ).collect()
    }
    # b's optimal path is a->c->b; d's is a->c->b->d
    assert got == {
        "a": (0, None),
        "b": (2, "c"),
        "c": (1, "a"),
        "d": (3, "b"),
    }
    # tie-break: two optimal predecessors -> smallest id wins
    g2 = spark.createDataFrame(
        [("a", "m", 1), ("a", "z", 1), ("m", "t", 1), ("z", "t", 1)], E
    )
    got2 = {
        r["id"]: r["pred"]
        for r in sssp(
            g2, _src(spark, "a"), max_hops=5, with_predecessor=True
        ).collect()
    }
    assert got2["t"] == "m"
    # walking preds reconstructs a path: t <- m <- a
    assert got2["m"] == "a" and got2["a"] is None


def test_predecessors_vs_duckdb(spark):
    rng = random.Random(57)
    rows = sorted(
        {
            (f"v{rng.randrange(25)}", f"v{rng.randrange(25)}", rng.randrange(1, 9))
            for _ in range(70)
        }
    )
    rows = [(s, d, w) for s, d, w in rows if s != d]
    g = spark.createDataFrame(rows, E)
    got = sorted(
        (r["id"], r["dist"], r["pred"])
        for r in sssp(
            g, _src(spark, "v0"), max_hops=25, with_predecessor=True
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (s VARCHAR, d VARCHAR, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    oracle = sorted(
        map(tuple, con.execute(f"""
            WITH RECURSIVE
            src AS (SELECT 'v0' AS id),
            {sssp_sql('e', 'src', 25)},
            {sssp_pred_sql('e')}
            SELECT r.id, r.dist, p.pred
            FROM sssp_result r LEFT JOIN sssp_pred p ON r.id = p.id
        """).fetchall())
    )
    assert got == oracle


def test_random_graph_vs_networkx_and_duckdb(spark):
    networkx = pytest.importorskip("networkx")
    rng = random.Random(31)
    n = 40
    rows = sorted(
        {
            (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}", rng.randrange(1, 20))
            for _ in range(120)
        }
    )
    rows = [(s, d, w) for s, d, w in rows if s != d]
    g = spark.createDataFrame(rows, E)
    got = _dist(sssp(g, _src(spark, "v0"), max_hops=n))

    G = networkx.DiGraph()
    for s, d, w in rows:
        if not G.has_edge(s, d) or G[s][d]["weight"] > w:
            G.add_edge(s, d, weight=w)
    want = networkx.single_source_dijkstra_path_length(G, "v0", weight="weight")
    if "v0" not in want:
        want["v0"] = 0
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE e (s VARCHAR, d VARCHAR, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    oracle = dict(
        con.execute(f"""
            WITH RECURSIVE
            src AS (SELECT 'v0' AS id),
            {sssp_sql('e', 'src', n)}
            SELECT id, dist FROM sssp_result
        """).fetchall()
    )
    assert got == oracle
