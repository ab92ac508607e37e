"""Connected-components correctness vs a networkx oracle on seeded
random graphs plus adversarial topologies (long chain — worst case for
propagation depth; star — worst case for hub skew; mixed forest).
"""

from __future__ import annotations

import random

import networkx as nx
import pytest

from kg_microbe_merge_spark.operators.components import (
    canonicalize_ids,
    connected_components,
)


def _oracle(edges: list[tuple[str, str]]) -> dict[str, str]:
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        rep = min(comp)
        for n in comp:
            out[n] = rep
    return out


def _check(spark, edges: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _oracle(edges)


def test_cc_long_chain(spark):
    # diameter 60 — requires O(log d) rounds, not O(d)
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(60)]
    _check(spark, edges)


def test_cc_star(spark):
    edges = [("hub", f"leaf{i:03d}") for i in range(100)]
    _check(spark, edges)


def test_cc_self_loops_and_dups(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"), ("c", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    # self-loop-only node 'c' still appears, mapped to itself
    assert got == {"a": "a", "b": "a", "c": "c"}


@pytest.mark.parametrize("seed", [1, 7])
def test_cc_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = [f"v{i:04d}" for i in range(300)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(260)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_canonicalize_ids(spark):
    nodes = spark.createDataFrame(
        [("A:1", "x"), ("B:1", "y"), ("C:9", "z")], "id string, name string"
    )
    same_as = spark.createDataFrame([("A:1", "B:1")], "src string, dst string")
    out = {r["id"]: r["canonical_id"] for r in canonicalize_ids(nodes, same_as).collect()}
    assert out == {"A:1": "A:1", "B:1": "A:1", "C:9": "C:9"}
