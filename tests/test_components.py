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
    connected_components_incremental,
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


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _inc_check(spark, old_edges, delta_edges):
    """Invariant: incremental(cc(E0), E1) == cc(E0 ∪ E1) — checked on
    BOTH quotient solvers (driver-side union-find, the default at delta
    size, and the distributed star-contraction fallback forced with
    driver_threshold=0)."""
    assignment = connected_components(_edges_df(spark, old_edges))
    want = _oracle(old_edges + delta_edges)
    for threshold in (2_000_000, 0):
        got = {
            r["node"]: r["component"]
            for r in connected_components_incremental(
                assignment,
                _edges_df(spark, delta_edges),
                driver_threshold=threshold,
            ).collect()
        }
        assert got == want, f"driver_threshold={threshold}"
        # and exactly one row per node
        assert len(got) == len(want)


def test_cc_incremental_merges_components(spark):
    # two chains merged by one delta edge; min-id root must win globally
    old = [("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("b2", "b3")]
    _inc_check(spark, old, [("a3", "b1")])


def test_cc_incremental_new_nodes_and_self_loops(spark):
    old = [("a1", "a2")]
    # brand-new chain, a new node attaching to an old component, and a
    # self-loop-only brand-new node
    delta = [("x1", "x2"), ("x2", "a2"), ("z9", "z9"), ("q1", "q2")]
    _inc_check(spark, old, delta)


def test_cc_incremental_noop_delta(spark):
    # delta re-stating an existing edge must not change anything
    old = [("a1", "a2"), ("b1", "b2")]
    _inc_check(spark, old, [("a1", "a2")])


@pytest.mark.parametrize("seed", [3, 11])
def test_cc_incremental_random_split(spark, seed):
    rng = random.Random(seed)
    nodes = [f"v{i:04d}" for i in range(200)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(180)]
    edges = [e for e in edges if e[0] != e[1]]
    cut = len(edges) * 3 // 4
    _inc_check(spark, edges[:cut], edges[cut:])


def test_cc_incremental_assignment_never_shuffled(spark):
    """The full assignment must only ever be the stream side of
    broadcast-hash joins — no sort-merge join of the big side."""
    old = [(f"c{i:03d}", f"n{i % 5}") for i in range(100)]
    # materialize the prior assignment as real use would read it from a
    # parquet snapshot — the assertion targets the incremental operator's
    # joins, not the lineage of however the assignment was first built
    assignment = connected_components(_edges_df(spark, old)).localCheckpoint(
        eager=True
    )
    out = connected_components_incremental(
        assignment, _edges_df(spark, [("c001", "n4"), ("NEW", "c002")])
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_canonicalize_ids(spark):
    nodes = spark.createDataFrame(
        [("A:1", "x"), ("B:1", "y"), ("C:9", "z")], "id string, name string"
    )
    same_as = spark.createDataFrame([("A:1", "B:1")], "src string, dst string")
    out = {r["id"]: r["canonical_id"] for r in canonicalize_ids(nodes, same_as).collect()}
    assert out == {"A:1": "A:1", "B:1": "A:1", "C:9": "C:9"}


def test_incremental_cc_gate_assignment(spark):
    """The kg_incremental_cc gate query constructs the prior assignment
    directly (one groupBy over the customer-nation star) instead of
    re-running the full CC as setup; the two must be byte-identical,
    else the incremental fold starts from wrong labels."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    base = customer.select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    full = {
        (r["node"], r["component"])
        for r in connected_components(base).collect()
    }
    per_nation = customer.groupBy("c_nationkey").agg(
        F.min(F.concat(F.lit("C"), F.col("c_custkey"))).alias("_min_c")
    )
    comp = F.least(
        F.col("_min_c"), F.concat(F.lit("N"), F.col("c_nationkey"))
    ).alias("component")
    direct = {
        (r["node"], r["component"])
        for r in customer.join(F.broadcast(per_nation), "c_nationkey")
        .select(F.concat(F.lit("C"), F.col("c_custkey")).alias("node"), comp)
        .unionByName(
            per_nation.select(
                F.concat(F.lit("N"), F.col("c_nationkey")).alias("node"), comp
            )
        )
        .collect()
    }
    assert direct == full
