"""Strongly connected components (operators/scc.py) vs the networkx
oracle: cycles, DAGs (trim fast path), interlocking cycles, self-loops,
functional graphs, and random directed graphs."""

from __future__ import annotations

import random

import pytest

from kg_microbe_merge_spark.operators.scc import (
    strongly_connected_components,
)

nx = pytest.importorskip("networkx")


def _oracle(edges):
    g = nx.DiGraph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for n in comp:
            out[n] = m
    return out


def _check(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in strongly_connected_components(df, **kw).collect()
    }
    assert got == _oracle(edges)


def test_single_cycle(spark):
    _check(spark, [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)])


def test_dag_all_singletons_via_trim(spark):
    # pure DAG: trim alone must settle everything (no propagation phase)
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    _check(spark, edges)


def test_cycle_with_tail_and_self_loop(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
        ("c", "d"), ("d", "e"),              # tail (singletons)
        ("f", "f"),                            # self-loop singleton
    ]
    _check(spark, edges)


def test_two_cycles_one_way_bridge_not_merged(spark):
    # the case undirected CC gets wrong: a bridge without a return path
    edges = (
        [(f"x{i}", f"x{(i + 1) % 3}") for i in range(3)]
        + [(f"y{i}", f"y{(i + 1) % 4}") for i in range(4)]
        + [("x0", "y0")]
    )
    df = _oracle(edges)
    assert df["x0"] != df["y0"]
    _check(spark, edges)


def test_interlocking_cycles_merge(spark):
    # two cycles sharing a node form ONE SCC
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    _check(spark, edges)


def test_functional_graph(spark):
    # i -> (3i + 1) mod 20: cycles + trees hanging into them
    edges = [(f"v{i}", f"v{(3 * i + 1) % 20}") for i in range(20)]
    _check(spark, edges)


def test_random_directed(spark):
    rng = random.Random(7)
    nodes = [f"r{i}" for i in range(30)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(70)
        }
    )
    edges = [(a, b) for a, b in edges if a != b] + [("r0", "r0")]
    _check(spark, edges)


def test_condensation_and_levels(spark):
    from kg_microbe_merge_spark.operators.scc import (
        condensation,
        topological_levels,
    )

    # two 2-cycles bridged one-way, plus a tail:
    # {a,b} -> {c,d} -> e
    edges = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
        ("b", "c"), ("d", "e"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    assign = strongly_connected_components(df)
    cond = condensation(df, assign)
    got_edges = {(r.src, r.dst) for r in cond.collect()}
    assert got_edges == {("a", "c"), ("c", "e")}

    lv = {r.node: r.level for r in topological_levels(cond).collect()}
    assert lv == {"a": 0, "c": 1, "e": 2}


def test_levels_longest_path_semantics(spark):
    from kg_microbe_merge_spark.operators.scc import topological_levels

    # diamond with a shortcut: level = LONGEST path from a source
    edges = [("s", "a"), ("s", "b"), ("a", "t"), ("b", "m"), ("m", "t")]
    df = spark.createDataFrame(edges, "src string, dst string")
    lv = {r.node: r.level for r in topological_levels(df).collect()}
    assert lv == {"s": 0, "a": 1, "b": 1, "m": 2, "t": 3}


def test_levels_cycle_raises(spark):
    from kg_microbe_merge_spark.operators.scc import topological_levels

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(df)
