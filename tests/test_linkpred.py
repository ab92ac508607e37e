"""Link prediction (operators/linkpred.py): scores match a pure-Python
twin (exact integer Adamic-Adar protocol), existing edges are excluded,
and the hub cap drops exactly the high-degree centers."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from kg_microbe_merge_spark.operators.linkpred import link_prediction_scores

MICRO = 1000000.0


def py_linkpred(edges, max_center_degree=None, min_common=1):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbr = defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    deg = {n: len(s) for n, s in nbr.items()}
    out = {}
    nodes = sorted(nbr)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in und:
                continue
            zs = nbr[a] & nbr[b]
            if max_center_degree is not None:
                zs = {z for z in zs if deg[z] <= max_center_degree}
            if len(zs) < min_common:
                continue
            aa = sum(
                math.floor(MICRO / math.log(deg[z]) + 0.5) for z in zs
            )
            jac = len(zs) / (deg[a] + deg[b] - len(zs))
            out[(a, b)] = (
                len(zs),
                aa / MICRO,
                math.floor(jac * MICRO + 0.5) / MICRO,
            )
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "subject string, object string")
    return {
        (r["node_a"], r["node_b"]): (
            r["common"],
            r["adamic_adar"],
            r["jaccard"],
        )
        for r in link_prediction_scores(df, **kw).collect()
    }


def test_square_predicts_diagonals(spark):
    # square a-b-c-d-a: the two diagonals are the only 2-common pairs
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    got = _run(spark, edges, max_center_degree=None)
    assert set(got) == {("a", "c"), ("b", "d")}
    c, aa, jac = got[("a", "c")]
    assert c == 2
    # both shared neighbors have degree 2: AA = 2/ln(2), jac = 2/2
    assert aa == 2 * math.floor(MICRO / math.log(2) + 0.5) / MICRO
    assert jac == 1.0


def test_matches_python_twin_random(spark):
    rng = random.Random(33)
    nodes = [f"n{i}" for i in range(25)]
    edges = list(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(60)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    for cap in (None, 4):
        got = _run(spark, edges, max_center_degree=cap)
        assert got == py_linkpred(edges, max_center_degree=cap), cap


def test_existing_edges_excluded_and_min_common(spark):
    edges = [("a", "z"), ("b", "z"), ("a", "b"), ("c", "z")]
    got = _run(spark, edges, max_center_degree=None, min_common=1)
    # (a,b) share z but are connected -> excluded
    assert ("a", "b") not in got
    assert ("a", "c") in got and ("b", "c") in got
    got2 = _run(spark, edges, max_center_degree=None, min_common=2)
    assert got2 == {}
