"""Greedy graph coloring by iterated Luby MIS
(operators/coloring.py): validity, python/DuckDB twin equality,
isolated-node handling, guards."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.coloring import (
    ColoringDepthExceeded,
    coloring_py,
    coloring_sql,
    greedy_coloring,
)


def _df(spark, edges):
    return spark.createDataFrame(edges, "subject string, object string")


def _collect(spark, edges, **kw):
    return {
        r["node"]: r["color"]
        for r in greedy_coloring(_df(spark, edges), **kw).collect()
    }


def _valid(edges, colors):
    for a, b in edges:
        if a != b:
            assert colors[a] != colors[b], (a, b)
    return True


def test_triangle_needs_three_colors_and_twin(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    got = _collect(spark, edges)
    assert got == coloring_py(edges)
    assert _valid(edges, got)
    assert set(got.values()) == {1, 2, 3}


def test_star_two_colors_and_isolated_progression(spark):
    # star: leaves and hub split over 2 colors; once the hub is
    # colored, remaining leaves become residual-isolated and must
    # still be colored (the isolated rule)
    edges = [("hub", f"l{i}") for i in range(8)]
    got = _collect(spark, edges)
    assert got == coloring_py(edges)
    assert _valid(edges, got)
    assert max(got.values()) <= 2
    assert len(got) == 9


def test_random_graph_twin_and_validity(spark):
    rng = random.Random(23)
    edges = sorted({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                    for _ in range(90)})
    edges = [e for e in edges if e[0] != e[1]]
    got = _collect(spark, edges)
    assert got == coloring_py(edges)
    assert _valid(edges, got)


def test_duckdb_twin_random_graph(spark):
    rng = random.Random(31)
    edges = sorted({(f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
                    for _ in range(55)})
    edges = [e for e in edges if e[0] != e[1]]
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    sql = coloring_sql(
        f"SELECT a AS src, b AS dst FROM (VALUES {vals}) t(a, b)",
        colors=8, mis_rounds=12,
    )
    want = dict(duckdb.sql(sql).fetchall())
    got = _collect(spark, edges)
    assert got == want and got


def test_color_classes_are_concurrency_batches(spark):
    # every color class is an independent set of the ORIGINAL graph
    rng = random.Random(40)
    edges = sorted({(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                    for _ in range(70)})
    edges = [e for e in edges if e[0] != e[1]]
    got = _collect(spark, edges)
    eset = {tuple(sorted(e)) for e in edges}
    by_color: dict = {}
    for n, c in got.items():
        by_color.setdefault(c, []).append(n)
    for members in by_color.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                assert tuple(sorted((a, b))) not in eset


def test_depth_guard(spark):
    with pytest.raises(ColoringDepthExceeded):
        greedy_coloring(
            _df(spark, [("a", "b"), ("b", "c"), ("a", "c")]),
            max_colors=2,
        )


def test_gate_graph_depth_within_oracle_unroll():
    # gate graph at sf0.01 (customer/supplier–nation stars): colors
    # and per-color MIS settle depth must fit the oracle unroll
    # (6 colors × 12 MIS rounds); both grow ~log with sf, far under
    # the bound at sf0.1 too
    import duckdb as d

    from kg_microbe_merge_spark.operators.mis import mis_py

    rows = d.sql(
        "SELECT 'C' || c_custkey, 'N' || c_nationkey "
        "FROM read_parquet('/root/testdata/sf0.01/customer.parquet') "
        "UNION ALL SELECT 'S' || s_suppkey, 'N' || s_nationkey "
        "FROM read_parquet('/root/testdata/sf0.01/supplier.parquet')"
    ).fetchall()
    und = set()
    for a, b in rows:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    uncolored = {a for a, _ in und}
    residual = set(und)
    colors_used, max_mis_depth = 0, 0
    while uncolored:
        colors_used += 1
        assert colors_used <= 6
        if residual:
            mis = mis_py([(a, b) for a, b in residual if a < b])
            max_mis_depth = max(
                max_mis_depth, max(r for _, r in mis.values())
            )
            endpoints = {a for a, _ in residual}
            winners = {n for n, (w, _) in mis.items() if w}
            winners |= uncolored - endpoints
        else:
            winners = set(uncolored)
        uncolored -= winners
        residual = {(a, b) for a, b in residual
                    if a in uncolored and b in uncolored}
    assert max_mis_depth <= 12, (colors_used, max_mis_depth)
