"""k-truss decomposition (operators/truss.py) vs networkx oracle."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.operators.truss import ktruss_edges, ktruss_nodes

nx = pytest.importorskip("networkx")


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], ["subject", "object"]
    )


def _nx_truss_edges(pairs, k):
    g = nx.Graph()
    g.add_edges_from((str(a), str(b)) for a, b in pairs if a != b)
    t = nx.k_truss(g, k)
    return {tuple(sorted(e)) for e in t.edges()}


def test_k4_survives_4truss(spark):
    # K4: every edge sits in exactly 2 triangles -> the whole clique is
    # the 4-truss; a pendant edge dies immediately
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1:]]
    pairs.append(("d", "e"))
    rows = ktruss_edges(_edges_df(spark, pairs), k=4).collect()
    assert {(r["a"], r["b"]) for r in rows} == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")
    }
    assert all(r["support"] == 2 for r in rows)


def test_chain_has_empty_3truss(spark):
    pairs = [(i, i + 1) for i in range(10)]
    assert ktruss_edges(_edges_df(spark, pairs), k=3).count() == 0


def test_peeling_cascade(spark):
    # triangle strip t0..t4 sharing edges: interior edges have support
    # 2, boundary edges 1 -> 4-truss peels from both ends and cascades
    # to empty (no edge keeps support 2 once the rim goes)
    pairs = []
    for i in range(5):
        pairs += [(i, i + 1), (i, i + 2), (i + 1, i + 2)]
    got = {
        (r["a"], r["b"])
        for r in ktruss_edges(_edges_df(spark, pairs), k=4).collect()
    }
    assert got == _nx_truss_edges(pairs, 4)


def test_truss_stronger_than_core(spark):
    # two vertex-disjoint triangles joined by a bridge c-d: the 2-core
    # keeps everything including the bridge (both endpoints stay
    # degree ≥ 2 in the node-induced core), but the 3-truss cuts the
    # bridge (no triangle contains it) while keeping both triangles —
    # the edge-granular distinction k-core cannot make.
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("d", "e"), ("d", "f"), ("e", "f"),
        ("c", "d"),  # bridge between the triangles
    ]
    from kg_microbe_merge_spark.operators.kcore import kcore_edges

    core = {
        (r["a"], r["b"])
        for r in kcore_edges(_edges_df(spark, pairs), k=2).collect()
    }
    assert ("c", "d") in core
    got = {
        (r["a"], r["b"])
        for r in ktruss_edges(_edges_df(spark, pairs), k=3).collect()
    }
    assert ("c", "d") not in got
    assert got == _nx_truss_edges(pairs, 3)


def test_self_loops_and_duplicates_ignored(spark):
    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "c"), ("a", "c")]
    rows = ktruss_edges(_edges_df(spark, pairs), k=3).collect()
    assert {(r["a"], r["b"]) for r in rows} == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }
    assert all(r["support"] == 1 for r in rows)


@pytest.mark.parametrize("k", [3, 4])
def test_random_graph_matches_networkx(spark, k):
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    got = {
        (r["a"], r["b"])
        for r in ktruss_edges(_edges_df(spark, pairs), k=k).collect()
    }
    assert got == _nx_truss_edges(pairs, k)


def test_truss_nodes_degrees(spark):
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1:]]
    got = {
        r["id"]: r["truss_degree"]
        for r in ktruss_nodes(_edges_df(spark, pairs), k=4).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k_below_3_rejected(spark):
    with pytest.raises(ValueError):
        ktruss_edges(_edges_df(spark, [("a", "b")]), k=2)


def test_gate_graph_peel_depth_within_oracle_unroll(spark):
    """The ktruss_3 DuckDB oracle unrolls 8 peel rounds; support peeling
    is a monotone fixpoint so the oracle is exact iff the gate graph
    converges in ≤ 8 rounds. Pin that on the sf0.001 gate graph by
    running the recurrence in plain Python, and cross-check values."""
    import __spark_entry__ as entry

    df = entry.q_ktruss(spark, "/root/testdata/sf0.001")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    supplier = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    pairs = set()
    nat_region = {f"N{r['n_nationkey']}": f"R{r['n_regionkey']}"
                  for r in nation.collect()}
    for n, rg in nat_region.items():
        pairs.add((n, rg))
    for r in supplier.collect():
        n = f"N{r['s_nationkey']}"
        pairs.add((f"S{r['s_suppkey']}", n))
        pairs.add((f"S{r['s_suppkey']}", nat_region[n]))
    for r in orders.collect():
        pairs.add((f"C{r['o_custkey']}", f"O{r['o_orderkey']}"))
    for r in customer.collect():
        pairs.add((f"C{r['c_custkey']}", f"N{r['c_nationkey']}"))

    def support(edges):
        adj: dict[str, set[str]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }

    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    rounds = 0
    while True:
        sup = support(edges)
        nxt = {e for e in edges if sup[e] >= 1}
        rounds += 1
        if nxt == edges:
            break
        edges = nxt
    assert rounds <= 8, f"gate graph peel depth {rounds} exceeds oracle unroll"

    sup = support(edges)
    got = {(r["a"], r["b"]): r["support"] for r in df.collect()}
    assert got == sup
