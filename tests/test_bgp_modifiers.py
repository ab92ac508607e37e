"""SPARQL solution modifiers in the BGP compiler (plans/bgp.py):
VALUES inline bindings, DISTINCT, ORDER BY asc/desc, LIMIT/OFFSET,
standard application order, and the guards."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.plans.bgp import bgp_query

T = "subject string, predicate string, object string"

ROWS = [
    ("a", "knows", "b"),
    ("a", "knows", "c"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("b", "likes", "c"),
]


def _g(spark):
    return spark.createDataFrame(ROWS, T)


def test_values_binding(spark):
    out = bgp_query(
        _g(spark),
        [("?x", "knows", "?y")],
        values={"?x": ["a", "c"]},
    )
    assert sorted((r["x"], r["y"]) for r in out.collect()) == [
        ("a", "b"), ("a", "c"), ("c", "d")
    ]
    with pytest.raises(ValueError):
        bgp_query(_g(spark), [("?x", "knows", "?y")], values={"?z": ["a"]})


def test_distinct_projection(spark):
    # project only ?x: 'a' and 'b' appear twice without DISTINCT
    bag = bgp_query(_g(spark), [("?x", "knows", "?y")], select=["?x"])
    assert sorted(r["x"] for r in bag.collect()) == ["a", "a", "b", "c"]
    dedup = bgp_query(
        _g(spark), [("?x", "knows", "?y")], select=["?x"], distinct=True
    )
    assert sorted(r["x"] for r in dedup.collect()) == ["a", "b", "c"]


def test_order_limit_offset(spark):
    out = bgp_query(
        _g(spark),
        [("?x", "knows", "?y")],
        order_by=["?x", "-?y"],
    )
    assert [(r["x"], r["y"]) for r in out.collect()] == [
        ("a", "c"), ("a", "b"), ("b", "c"), ("c", "d")
    ]
    top2 = bgp_query(
        _g(spark),
        [("?x", "knows", "?y")],
        order_by=["?x", "-?y"],
        limit=2,
    )
    assert [(r["x"], r["y"]) for r in top2.collect()] == [
        ("a", "c"), ("a", "b")
    ]
    page = bgp_query(
        _g(spark),
        [("?x", "knows", "?y")],
        order_by=["?x", "-?y"],
        offset=1,
        limit=2,
    )
    assert [(r["x"], r["y"]) for r in page.collect()] == [
        ("a", "b"), ("b", "c")
    ]


def test_modifier_guards(spark):
    with pytest.raises(ValueError):
        bgp_query(
            _g(spark), [("?x", "knows", "?y")], order_by=["?nope"]
        )
    with pytest.raises(ValueError):
        bgp_query(_g(spark), [("?x", "knows", "?y")], offset=1)


def test_values_compose_with_paths_and_filters(spark):
    out = bgp_query(
        _g(spark),
        [("?x", "knows+", "?y")],
        values={"?y": ["d"]},
        filters=["?x != 'c'"],
        order_by=["?x"],
    )
    assert [(r["x"], r["y"]) for r in out.collect()] == [
        ("a", "d"), ("b", "d")
    ]
