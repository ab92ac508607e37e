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


# --- modularity ------------------------------------------------------


def _mod_df(spark, edges, assignment):
    e = spark.createDataFrame(edges, "src string, dst string")
    a = spark.createDataFrame(assignment, "node string, community string")
    return e, a


def _mod_twin(edges, assignment):
    g = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    m = len(g)
    lab = dict(assignment)
    deg = {}
    for a, b in g:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for n, d in deg.items():
        c = lab.get(n, n)
        nn, ee, dd = out.get(c, (0, 0, 0))
        out[c] = (nn + 1, ee, dd + d)
    for a, b in g:
        if lab.get(a, a) == lab.get(b, b):
            c = lab.get(a, a)
            nn, ee, dd = out[c]
            out[c] = (nn, ee + 1, dd)
    return {
        c: (nn, ee, dd, 4 * m * ee - dd * dd, 4 * m * m)
        for c, (nn, ee, dd) in out.items()
    }


def test_modularity_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge, communities = triangles
    edges = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
             ("a1", "b1")]
    assignment = [(n, n[0]) for n in
                  ("a1", "a2", "a3", "b1", "b2", "b3")]
    e, a = _mod_df(spark, edges, assignment)
    from kg_microbe_merge_spark.operators.labelprop import modularity
    got = {
        r["community"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"],
                         r["q_term_num"], r["q_den"])
        for r in modularity(e, a).collect()
    }
    assert got == _mod_twin(edges, assignment)
    # m=7, each side: e_c=3, d_c=7 -> 4*7*3 - 49 = 35; Q = 70/196
    assert got["a"] == (3, 3, 7, 35, 196)
    q = sum(v[3] for v in got.values()) / got["a"][4]
    assert abs(q - 70 / 196) < 1e-12


def test_modularity_singleton_fallback_and_zero_intra(spark):
    # unassigned node u becomes its own community; assignment putting
    # every node in a distinct community has zero intra edges
    edges = [("x", "y"), ("y", "z"), ("z", "u")]
    assignment = [("x", "c1"), ("y", "c2"), ("z", "c3")]
    e, a = _mod_df(spark, edges, assignment)
    from kg_microbe_merge_spark.operators.labelprop import modularity
    got = {
        r["community"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"],
                         r["q_term_num"], r["q_den"])
        for r in modularity(e, a).collect()
    }
    assert got == _mod_twin(edges, assignment)
    assert set(got) == {"c1", "c2", "c3", "u"}
    assert all(v[1] == 0 for v in got.values())


def test_modularity_random_twin(spark):
    import random as _r

    rng = _r.Random(3)
    edges = sorted({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                    for _ in range(80)})
    assignment = [(f"n{i}", f"c{i % 4}") for i in range(30)]
    e, a = _mod_df(spark, edges, assignment)
    from kg_microbe_merge_spark.operators.labelprop import modularity
    got = {
        r["community"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"],
                         r["q_term_num"], r["q_den"])
        for r in modularity(e, a).collect()
    }
    assert got == _mod_twin(edges, assignment)
    # perfect-partition identity: Σ q_term_num/q_den == Q in [-0.5, 1]
    q = sum(v[3] for v in got.values()) / (4 * len(
        {tuple(sorted(p)) for p in edges if p[0] != p[1]}) ** 2)
    assert -0.5 <= q <= 1.0
