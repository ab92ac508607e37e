"""Basic-graph-pattern query compiler (plans/bgp.py): constants,
variable joins, repeated variables, cross patterns, projection."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.plans.bgp import bgp_query


def _graph(spark):
    rows = [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
        ("a", "likes", "c"),
        ("c", "knows", "c"),   # self-loop for repeated-var pattern
        ("b", "likes", "a"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )


def test_single_pattern_constant_filter(spark):
    g = _graph(spark)
    out = bgp_query(g, [("?x", "knows", "?y")])
    assert {(r["x"], r["y"]) for r in out.collect()} == {
        ("a", "b"), ("b", "c"), ("c", "c")
    }


def test_two_hop_join(spark):
    g = _graph(spark)
    out = bgp_query(g, [("?x", "knows", "?y"), ("?y", "knows", "?z")])
    got = {(r["x"], r["y"], r["z"]) for r in out.collect()}
    assert got == {("a", "b", "c"), ("b", "c", "c"), ("c", "c", "c")}


def test_repeated_variable_within_pattern(spark):
    g = _graph(spark)
    out = bgp_query(g, [("?x", "knows", "?x")])
    assert {r["x"] for r in out.collect()} == {"c"}


def test_projection_and_constant_subject(spark):
    g = _graph(spark)
    out = bgp_query(
        g, [("a", "?p", "?y"), ("?y", "knows", "?z")], select=["?p", "?z"]
    )
    got = {(r["p"], r["z"]) for r in out.collect()}
    # a knows b (b knows c); a likes c (c knows c)
    assert got == {("knows", "c"), ("likes", "c")}


def test_disconnected_patterns_cross_join(spark):
    g = _graph(spark)
    out = bgp_query(g, [("?x", "likes", "?y"), ("?u", "knows", "?u")])
    got = {(r["x"], r["y"], r["u"]) for r in out.collect()}
    assert got == {("a", "c", "c"), ("b", "a", "c")}


def test_empty_patterns_rejected(spark):
    with pytest.raises(ValueError):
        bgp_query(_graph(spark), [])


def test_variable_named_after_positional_column(spark):
    """A variable named ?object (or ?subject/?predicate) must not collide
    with the real edge column in the same projection."""
    g = _graph(spark)
    out = bgp_query(g, [("?object", "knows", "?subject")])
    got = {(r["object"], r["subject"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c"), ("c", "c")}
    out2 = bgp_query(
        g, [("?object", "?predicate", "?subject")], select=["?predicate"]
    )
    assert {r["predicate"] for r in out2.collect()} == {"knows", "likes"}


def test_filter_expression(spark):
    g = _graph(spark)
    out = bgp_query(
        g, [("?x", "knows", "?y")], filters=["?x != ?y", "?x != 'a'"]
    )
    assert {(r["x"], r["y"]) for r in out.collect()} == {("b", "c")}


def test_optional_left_join(spark):
    g = _graph(spark)
    # every knower, optionally what their target likes
    out = bgp_query(
        g,
        [("?x", "knows", "?y")],
        optional=[[("?y", "likes", "?z")]],
    )
    got = {(r["x"], r["y"], r["z"]) for r in out.collect()}
    # b likes a; c likes nothing -> NULL binding preserved
    assert got == {("a", "b", "a"), ("b", "c", None), ("c", "c", None)}


def test_optional_then_filter_on_optional_var(spark):
    g = _graph(spark)
    out = bgp_query(
        g,
        [("?x", "knows", "?y")],
        optional=[[("?y", "likes", "?z")]],
        filters=["?z IS NULL"],
        select=["?x"],
    )
    assert {r["x"] for r in out.collect()} == {"b", "c"}


def test_optional_requires_shared_variable(spark):
    g = _graph(spark)
    with pytest.raises(ValueError):
        bgp_query(g, [("?x", "knows", "?y")], optional=[[("?u", "likes", "?v")]])


def test_union_branches(spark):
    g = _graph(spark)
    # ?x knows ?y, and additionally ?x (likes UNION knows) ?w
    out = bgp_query(
        g,
        [("?x", "knows", "?y")],
        union=[[("?x", "likes", "?w")], [("?w", "likes", "?x")]],
    )
    got = {(r["x"], r["y"], r["w"]) for r in out.collect()}
    # branch 1: a likes c, b likes a; branch 2: x liked-by w
    assert got == {
        ("a", "b", "c"),   # a knows b, a likes c
        ("b", "c", "a"),   # b knows c, b likes a
        ("a", "b", "b"),   # a knows b, b likes a (branch 2)
        ("c", "c", "a"),   # c knows c, a likes c (branch 2)
    }


def test_union_unbound_vars_are_null(spark):
    g = _graph(spark)
    # branches bind DIFFERENT variables: ?p only in branch 1, ?q only
    # in branch 2 -> NULL in the other branch's rows (SPARQL UNION)
    out = bgp_query(
        g,
        [("a", "knows", "?y")],
        union=[[("?y", "knows", "?p")], [("?y", "likes", "?q")]],
    )
    got = {(r["y"], r["p"], r["q"]) for r in out.collect()}
    assert got == {("b", "c", None), ("b", None, "a")}


def test_union_requires_two_groups(spark):
    g = _graph(spark)
    with pytest.raises(ValueError):
        bgp_query(g, [("?x", "knows", "?y")], union=[[("?x", "likes", "?w")]])
