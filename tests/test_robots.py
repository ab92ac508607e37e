"""robots.txt parsing + fetch-permission evaluation
(operators/robots.py): RFC 9309 group selection, longest-prefix /
allow-wins matching, default-allowed, DuckDB twin equivalence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.robots import (
    _parse_one,
    allowed_frontier,
    decisions_sql,
    parse_robots,
    robots_decisions,
)

A_TXT = """# KG crawl policy
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp*

User-agent: KGBot
Disallow: /kg
Allow: /kg/open
Disallow:
"""

B_TXT = """User-agent: *
Disallow: /x
Allow: /xy
Disallow: /t1
Allow: /t1
"""

D_TXT = """User-agent: one
User-agent: kgbot
Disallow: /shared
"""


def test_parse_group_selection_and_hygiene():
    # exact agent (case-insensitive) beats *; empty Disallow ignored
    rules, dropped = _parse_one(A_TXT, "kgbot", 1000)
    assert rules == [(False, "/kg"), (True, "/kg/open")]
    assert dropped == 0
    # unmatched agent falls back to *; wildcard rule dropped + counted
    rules, dropped = _parse_one(A_TXT, "otherbot", 1000)
    assert rules == [(False, "/private"), (True, "/private/ok")]
    assert dropped == 1
    # consecutive User-agent lines share the following rules
    assert _parse_one(D_TXT, "kgbot", 1000)[0] == [(False, "/shared")]
    assert _parse_one(D_TXT, "one", 1000)[0] == [(False, "/shared")]
    # rules before any user-agent line are ignored; no groups -> empty
    assert _parse_one("Disallow: /\nUser-agent: *\nAllow: /a", "x", 9)[
        0
    ] == [(True, "/a")]
    assert _parse_one("", "kgbot", 1000) == ([], 0)
    # a later group for the SAME token merges (RFC 9309 2.2.1)
    two = "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\nUser-agent: a\nDisallow: /3\n"
    assert _parse_one(two, "a", 1000)[0] == [(False, "/1"), (False, "/3")]
    # max_rules caps retained rules
    many = "User-agent: *\n" + "".join(
        f"Disallow: /p{i}\n" for i in range(10)
    )
    assert len(_parse_one(many, "*", 3)[0]) == 3


def test_decisions_semantics(spark):
    robots = spark.createDataFrame(
        [("a.com", A_TXT), ("b.com", B_TXT), ("d.com", D_TXT)],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, user_agent="KGBot")
    urls = spark.createDataFrame(
        [
            ("https://a.com/kg/page",),  # /kg deny
            ("https://a.com/kg/open/x",),  # /kg/open allow (longest)
            ("https://a.com/other",),  # no match -> allowed
            ("https://b.com/xyz",),  # /xy allow beats /x deny
            ("https://b.com/x",),  # /x deny
            ("https://b.com/t1z",),  # /t1 tie -> allow wins
            ("https://b.com",),  # empty path -> '/' -> allowed
            ("https://c.com/anything",),  # no robots row -> allowed
            ("https://d.com/shared/a",),  # merged-agent group deny
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["rule_path"])
        for r in robots_decisions(urls, rules).collect()
    }
    assert got == {
        "https://a.com/kg/page": (False, "/kg"),
        "https://a.com/kg/open/x": (True, "/kg/open"),
        "https://a.com/other": (True, None),
        "https://b.com/xyz": (True, "/xy"),
        "https://b.com/x": (False, "/x"),
        "https://b.com/t1z": (True, "/t1"),
        "https://b.com": (True, None),
        "https://c.com/anything": (True, None),
        "https://d.com/shared/a": (False, "/shared"),
    }
    kept = {
        r["url"] for r in allowed_frontier(urls, rules).collect()
    }
    assert kept == {u for u, (a, _p) in got.items() if a}


def test_duckdb_twin_equivalence(spark):
    robots = spark.createDataFrame(
        [("a.com", A_TXT), ("b.com", B_TXT), ("d.com", D_TXT)],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, user_agent="KGBot")
    urls = spark.createDataFrame(
        [
            (f"https://{h}{p}",)
            for h in ("a.com", "b.com", "c.com", "d.com")
            for p in (
                "", "/", "/kg", "/kg/open", "/kg/openx", "/x", "/xy",
                "/t1", "/private/ok/d", "/shared",
            )
        ],
        "url string",
    )
    spark_rows = sorted(
        tuple(r) for r in robots_decisions(urls, rules).collect()
    )
    con = duckdb.connect()
    rules_pd = rules.select(
        "host", "rule_allow", "rule_path"
    ).toPandas()
    urls_pd = urls.toPandas()
    con.register("rules_t", rules_pd)
    con.register("urls_raw", urls_pd)
    sql = f"""
        WITH u AS (
            SELECT url,
                   regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                   CASE WHEN regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                        THEN '/' ELSE regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
                   END AS pth
            FROM urls_raw),
        {decisions_sql('u', 'rules_t')}
        SELECT url, host, allowed, rule_allow, rule_path FROM verdict
    """
    oracle_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == oracle_rows


def test_no_window_in_plan(spark):
    robots = spark.createDataFrame(
        [("a.com", A_TXT)], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [("https://a.com/kg",)], "url string"
    )
    plan = robots_decisions(
        urls, parse_robots(robots, "KGBot")
    )._jdf.queryExecution().executedPlan().toString()
    # longest-match selection is a partial-aggregable max, not a window
    assert "Window" not in plan
    assert "partial_max" in plan or "partial" in plan.lower()


def test_param_validation(spark):
    df = spark.createDataFrame([], "host string, robots_txt string")
    with pytest.raises(ValueError):
        parse_robots(df, max_rules=0)
