"""Truncated Katz centrality (operators/katz.py): hand values,
python/DuckDB twin equality, centrality ordering, guards."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.operators.katz import (
    katz_centrality,
    katz_py,
    katz_sql,
)


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _collect(spark, edges, **kw):
    return {
        r["node"]: r["katz_micro"]
        for r in katz_centrality(_df(spark, edges), **kw).collect()
    }


def test_chain_hand_values(spark):
    # a -> b -> c with alpha=0.5: after 2 rounds
    # c(b) = 500000 (one 1-step walk), c(c) = 500000 + 250000
    edges = [("a", "b"), ("b", "c")]
    got = _collect(spark, edges, alpha_micro=500_000, iterations=2)
    assert got == katz_py(edges, 500_000, 2)
    assert got == {"a": 0, "b": 500_000, "c": 750_000}


def test_hub_targets_rank_highest(spark):
    # everyone links to 'hub'; hub links to one page
    edges = [(f"s{i}", "hub") for i in range(10)] + [("hub", "page")]
    got = _collect(spark, edges)
    assert got == katz_py(edges)
    assert got["hub"] == max(got.values())
    assert got["page"] > got["s0"] == 0


def test_random_graph_python_and_duckdb_twins(spark):
    rng = random.Random(9)
    edges = sorted({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                    for _ in range(100)})
    got = _collect(spark, edges, alpha_micro=200_000, iterations=5)
    assert got == katz_py(edges, 200_000, 5)
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    sql = katz_sql(
        f"SELECT a AS src, b AS dst FROM (VALUES {vals}) t(a, b)",
        alpha_micro=200_000, iterations=5,
    )
    assert got == dict(duckdb.sql(sql).fetchall())


def test_truncation_monotone_in_iterations(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]  # cycle: walks forever
    k2 = katz_py(edges, 300_000, 2)
    k5 = katz_py(edges, 300_000, 5)
    assert all(k5[n] >= k2[n] for n in k2)
    assert any(k5[n] > k2[n] for n in k2)


def test_guards(spark):
    e = _df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(e, alpha_micro=0)
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(e, alpha_micro=1_000_000)
    with pytest.raises(ValueError, match="iterations"):
        katz_centrality(e, iterations=0)
