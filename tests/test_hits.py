"""HITS hubs & authorities (operators/hits.py): scores match a
pure-Python twin of the max-normalized recurrence; structural cases
(bipartite star, pure hub vs pure authority) come out right."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from kg_microbe_merge_spark.operators.hits import hits


def py_hits(edges, iterations=4):
    e = sorted(set(edges))
    nodes = sorted({n for ab in e for n in ab})
    out_e = defaultdict(list)
    in_e = defaultdict(list)
    for a, b in e:
        out_e[a].append(b)
        in_e[b].append(a)
    hub = {n: 1.0 for n in nodes}
    auth = {}
    for _ in range(iterations):
        auth = {n: sum(hub[m] for m in in_e[n]) for n in nodes}
        mx = max(auth.values())
        auth = {n: (v / mx if mx > 0 else 0.0) for n, v in auth.items()}
        hub = {n: sum(auth[m] for m in out_e[n]) for n in nodes}
        mx = max(hub.values())
        hub = {n: (v / mx if mx > 0 else 0.0) for n, v in hub.items()}
    return {n: (round(hub[n], 6), round(auth[n], 6)) for n in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, **kw).collect()
    }


def test_bipartite_star(spark):
    # h1,h2 -> a1,a2,a3: hubs have authority 0, authorities hub 0,
    # symmetric scores normalize to 1.0
    edges = [(h, a) for h in ("h1", "h2") for a in ("a1", "a2", "a3")]
    got = _run(spark, edges)
    for h in ("h1", "h2"):
        assert got[h] == (1.0, 0.0)
    for a in ("a1", "a2", "a3"):
        assert got[a] == (0.0, 1.0)


def test_better_hub_ranks_higher(spark):
    # g links to both authorities, b to one; the shared authority
    # outranks the exclusive one
    edges = [("g", "x"), ("g", "y"), ("b", "x")]
    got = _run(spark, edges)
    assert got["g"][0] == 1.0 and got["b"][0] < 1.0
    assert got["x"][1] == 1.0 and got["y"][1] < 1.0


def test_matches_python_twin_random(spark):
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(18)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(50)
        }
    )
    for iters in (1, 4):
        got = _run(spark, edges, iterations=iters)
        want = py_hits(edges, iterations=iters)
        assert set(got) == set(want)
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-6), n
