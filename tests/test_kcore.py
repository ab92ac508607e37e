"""k-core decomposition (operators/kcore.py) vs networkx oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.kcore import kcore_edges, kcore_nodes

nx = pytest.importorskip("networkx")


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], ["subject", "object"]
    )


def _nx_core_degrees(pairs, k):
    g = nx.Graph()
    g.add_edges_from((str(a), str(b)) for a, b in pairs if a != b)
    core = nx.k_core(g, k)
    return {n: d for n, d in core.degree()}


def test_chain_has_empty_2core(spark):
    pairs = [(i, i + 1) for i in range(10)]
    assert kcore_nodes(_edges_df(spark, pairs), k=2).count() == 0


def test_triangle_with_tail(spark):
    # triangle a-b-c plus tail c-d-e: 2-core = the triangle only,
    # peeled in two rounds (e first, then d)
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    got = {
        r["id"]: r["core_degree"]
        for r in kcore_nodes(_edges_df(spark, pairs), k=2).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


def test_self_loops_and_duplicates_ignored(spark):
    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "c"), ("a", "c")]
    got = {
        r["id"]: r["core_degree"]
        for r in kcore_nodes(_edges_df(spark, pairs), k=2).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


@pytest.mark.parametrize("k", [2, 3])
def test_random_graph_matches_networkx(spark, k):
    import random

    rng = random.Random(7)
    pairs = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(120)
    ]
    got = {
        r["id"]: r["core_degree"]
        for r in kcore_nodes(_edges_df(spark, pairs), k=k).collect()
    }
    assert got == _nx_core_degrees(pairs, k)


def test_gate_graph_peel_depth_within_oracle_unroll(spark):
    """The kcore_2 DuckDB oracle unrolls 10 peel rounds; peeling is a
    monotone fixpoint so the oracle is exact iff the gate graph
    converges in ≤ 10 rounds. Pin that on the sf0.001 gate graph by
    running the per-round recurrence in plain Python."""
    import __spark_entry__ as entry

    df = entry.q_kcore(spark, "/root/testdata/sf0.001")
    # reconstruct the same edge set driver-side (small at sf0.001)
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    supplier = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    pairs = set()
    for r in nation.collect():
        pairs.add((f"N{r['n_nationkey']}", f"R{r['n_regionkey']}"))
    nat_region = {f"N{r['n_nationkey']}": f"R{r['n_regionkey']}"
                  for r in nation.collect()}
    for r in supplier.collect():
        n = f"N{r['s_nationkey']}"
        pairs.add((f"S{r['s_suppkey']}", n))
        pairs.add((f"S{r['s_suppkey']}", nat_region[n]))
    for r in orders.collect():
        pairs.add((f"C{r['o_custkey']}", f"O{r['o_orderkey']}"))
    for r in customer.collect():
        pairs.add((f"C{r['c_custkey']}", f"N{r['c_nationkey']}"))

    # python peel, counting rounds to fixpoint
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    rounds = 0
    while True:
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= 2}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        rounds += 1
        if nxt == edges:
            break
        edges = nxt
    assert rounds <= 10, f"gate graph peel depth {rounds} exceeds oracle unroll"

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r["id"]: r["core_degree"] for r in df.collect()}
    assert got == deg


def test_kcore_edges_canonical(spark):
    pairs = [("b", "a"), ("a", "c"), ("c", "b")]
    rows = kcore_edges(_edges_df(spark, pairs), k=2).collect()
    assert all(r["a"] < r["b"] for r in rows)
    assert len(rows) == 3
