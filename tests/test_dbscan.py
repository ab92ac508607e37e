"""Density clustering over a similarity pair relation
(operators/dbscan.py): core/border/noise roles, density-reachability
via core–core CC only, deterministic border pinning, DuckDB twin."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.dbscan import (
    dbscan_from_pairs,
    dbscan_sql,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def _collect(spark, pairs, **kw):
    return {
        r["point"]: (r["role"], r["cluster"])
        for r in dbscan_from_pairs(_df(spark, pairs), **kw).collect()
    }


def _twin(pairs, min_pts=3):
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    adj: dict = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    core = {n for n, nb in adj.items() if len(nb) >= min_pts}
    # CC over core-core edges
    lab = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for a, b in sym:
            if a in core and b in core and lab[b] < lab[a]:
                lab[a] = lab[b]
                changed = True
    out = {}
    for c in core:
        out[c] = ("core", lab[c])
    for n, nb in adj.items():
        if n in core:
            continue
        core_nb = sorted(lab[x] for x in nb if x in core)
        out[n] = ("border", core_nb[0]) if core_nb else ("noise", None)
    return out


def _blob_pairs():
    # dense blob b0..b4 (clique), a bridge border point, a far pair
    blob = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
    return blob + [("b0", "edge"), ("x", "y")]


def test_roles_and_cluster_labels(spark):
    got = _collect(spark, _blob_pairs(), min_pts=3)
    assert got == _twin(_blob_pairs(), min_pts=3)
    assert got["b0"] == ("core", "b0")
    assert got["edge"] == ("border", "b0")
    assert got["x"] == ("noise", None)
    assert got["y"] == ("noise", None)


def test_border_never_chains_clusters(spark):
    # two 4-cliques joined ONLY through a shared border point: cores
    # stay two clusters; the border pins to the min label
    c1 = [(f"p{i}", f"p{j}") for i in range(4) for j in range(i + 1, 4)]
    c2 = [(f"q{i}", f"q{j}") for i in range(4) for j in range(i + 1, 4)]
    pairs = c1 + c2 + [("p0", "m"), ("q0", "m")]
    got = _collect(spark, pairs, min_pts=3)
    assert got == _twin(pairs, min_pts=3)
    assert {got[f"p{i}"][1] for i in range(4)} == {"p0"}
    assert {got[f"q{i}"][1] for i in range(4)} == {"q0"}
    assert got["m"] == ("border", "p0")


def test_singleton_core_and_min_pts_one(spark):
    # min_pts=1: every paired point is core; isolated core pairs form
    # their own 2-clusters
    pairs = [("a", "b"), ("c", "d")]
    got = _collect(spark, pairs, min_pts=1)
    assert got == _twin(pairs, min_pts=1)
    assert got == {
        "a": ("core", "a"), "b": ("core", "a"),
        "c": ("core", "c"), "d": ("core", "c"),
    }


def test_random_pairs_twin_and_duckdb(spark):
    rng = random.Random(17)
    pairs = sorted({(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
                    for _ in range(120)})
    pairs = [p for p in pairs if p[0] != p[1]]
    got = _collect(spark, pairs, min_pts=3)
    assert got == _twin(pairs, min_pts=3)
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    sql = dbscan_sql(
        f"SELECT a AS id_a, b AS id_b FROM (VALUES {vals}) t(a, b)",
        min_pts=3,
    )
    want = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_min_pts_guard(spark):
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_from_pairs(_df(spark, [("a", "b")]), min_pts=0)
