"""SPARQL property paths in the BGP compiler (plans/bgp.py):
inverse / sequence / alternation / +, *, ? closures, parenthesized
composition, syntax errors, join with plain patterns, and a DuckDB
recursive-CTE oracle on a random graph."""

from __future__ import annotations

import random

import duckdb
import pytest

from kg_microbe_merge_spark.plans.bgp import (
    PathSyntaxError,
    bgp_query,
)

T = "subject string, predicate string, object string"

ROWS = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("a", "likes", "c"),
    ("d", "likes", "a"),
]


def _g(spark):
    return spark.createDataFrame(ROWS, T)


def _set(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_plus_closure(spark):
    out = bgp_query(_g(spark), [("?x", "knows+", "?y")])
    assert _set(out, "x", "y") == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }


def test_star_and_question_zero_length(spark):
    out = bgp_query(_g(spark), [("a", "knows*", "?y")])
    assert _set(out, "y") == {("a",), ("b",), ("c",), ("d",)}
    out = bgp_query(_g(spark), [("a", "knows?", "?y")])
    assert _set(out, "y") == {("a",), ("b",)}


def test_inverse_sequence_alternation(spark):
    g = _g(spark)
    assert _set(bgp_query(g, [("?x", "^likes", "?y")]), "x", "y") == {
        ("c", "a"), ("a", "d")
    }
    # knows/likes: a-knows-b? b likes nothing; knows then likes
    assert _set(bgp_query(g, [("?x", "knows/knows", "?y")]), "x", "y") == {
        ("a", "c"), ("b", "d")
    }
    assert _set(bgp_query(g, [("?x", "knows|likes", "?y")]), "x", "y") == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a")
    }


def test_parenthesized_composition(spark):
    # (knows|likes)+ reaches everything reachable in the whole graph
    out = bgp_query(_g(spark), [("d", "(knows|likes)+", "?y")])
    assert _set(out, "y") == {("a",), ("b",), ("c",), ("d",)}
    # sequence of closure and inverse: knows+/^likes
    out = bgp_query(_g(spark), [("?x", "knows+/^likes", "?y")])
    # knows+ to c then ^likes c->a ; knows+ to a? none reach a via knows
    assert _set(out, "x", "y") == {("a", "a"), ("b", "a")}


def test_path_joins_plain_pattern(spark):
    out = bgp_query(
        _g(spark),
        [("?x", "knows+", "?y"), ("?y", "likes", "?z")],
    )
    # likes sources are a and d; only d is knows+-reachable
    assert _set(out, "x", "y", "z") == {
        ("a", "d", "a"),
        ("b", "d", "a"),
        ("c", "d", "a"),
    }


def test_syntax_errors(spark):
    g = _g(spark)
    for bad in ("knows+/", "(knows", "knows||likes", "^", "knows)x"):
        with pytest.raises(PathSyntaxError):
            bgp_query(g, [("?x", bad, "?y")])


def test_random_graph_vs_duckdb(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(18)]
    rows = sorted(
        {
            (
                nodes[rng.randrange(18)],
                rng.choice(["p", "q"]),
                nodes[rng.randrange(18)],
            )
            for _ in range(40)
        }
    )
    g = spark.createDataFrame(rows, T)
    got = _set(bgp_query(g, [("?x", "(p|^q)+", "?y")]), "x", "y")
    con = duckdb.connect()
    con.execute("CREATE TABLE e (s VARCHAR, p VARCHAR, o VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    oracle = set(
        con.execute("""
            WITH RECURSIVE
            step AS (
                SELECT s, o FROM e WHERE p = 'p'
                UNION
                SELECT o, s FROM e WHERE p = 'q'),
            r(s, o) AS (
                SELECT s, o FROM step
                UNION
                SELECT r.s, step.o FROM r JOIN step ON r.o = step.s)
            SELECT s, o FROM r
        """).fetchall()
    )
    assert got == oracle
