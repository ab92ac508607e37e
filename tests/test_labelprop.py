"""Label propagation (operators/labelprop.py): the synchronous
min-tie-break recurrence matches a pure-Python twin on crafted and
random graphs, community structure comes out right on two bridged
cliques, and the assignment is partitioning-invariant."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.labelprop import (
    community_sizes,
    label_propagation,
)


# ---------------------------------------------------------------- twin
def py_lpa(edges, iterations=4, directed=False):
    edges = {(a, b) for a, b in edges if a != b}
    if not directed:
        edges |= {(b, a) for a, b in edges}
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    out = {n: [] for n in nodes}
    for a, b in edges:
        out[a].append(b)
    labels = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            votes = Counter(labels[m] for m in out[n])
            if votes:
                best = max(votes.values())
                new[n] = min(l for l, c in votes.items() if c == best)
            else:
                new[n] = labels[n]
        labels = new
    return labels


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = label_propagation(df, **kw)
    return {r["node"]: r["community"] for r in out.collect()}


def test_two_cliques_with_bridge(spark):
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = clique(["a1", "a2", "a3", "a4"]) + clique(
        ["b1", "b2", "b3", "b4"]
    ) + [("a1", "b1")]
    got = _run(spark, edges)
    assert got == py_lpa(edges)
    # the two cliques form two communities (the bridge does not fuse
    # 4-cliques under mode voting)
    a_comms = {got[n] for n in ("a2", "a3", "a4")}
    b_comms = {got[n] for n in ("b2", "b3", "b4")}
    assert len(a_comms) == 1 and len(b_comms) == 1
    assert a_comms != b_comms


def test_matches_twin_on_random_graph(spark):
    rng = random.Random(42)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    for iters in (0, 1, 3):
        got = _run(spark, edges, iterations=iters)
        assert got == py_lpa(edges, iterations=iters), iters


def test_directed_votes_from_out_neighbors(spark):
    edges = [("x", "h"), ("y", "h"), ("z", "h")]
    got = _run(spark, edges, directed=True, iterations=1)
    # x,y,z each see only h; h has no out-neighbors and keeps its label
    assert got == {"x": "h", "y": "h", "z": "h", "h": "h"}
    assert got == py_lpa(edges, iterations=1, directed=True)


def test_self_loops_dropped_and_sizes(spark):
    edges = [("s", "s"), ("s", "t"), ("u", "u")]
    # u only has a self-loop -> no edges survive for it -> not in the
    # node universe (matches the twin's universe built from kept edges)
    got = _run(spark, edges, iterations=2)
    assert set(got) == {"s", "t"}
    assert got == py_lpa(edges, iterations=2)
    df = spark.createDataFrame(
        [(n, c) for n, c in got.items()], "node string, community string"
    )
    sizes = {
        r["community"]: r["n_nodes"] for r in community_sizes(df).collect()
    }
    assert sum(sizes.values()) == 2


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    nodes = [f"m{i}" for i in range(20)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {
        r["node"]: r["community"]
        for r in label_propagation(df.repartition(1)).collect()
    }
    b = {
        r["node"]: r["community"]
        for r in label_propagation(df.repartition(13)).collect()
    }
    assert a == b
