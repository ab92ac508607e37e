"""Crawl-frontier canonicalization + politeness scheduling
(operators/frontier.py) vs the Python and DuckDB twins."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.operators.frontier import (
    canonical_url_py,
    canonical_url_sql,
    canonicalize_urls,
    fetch_schedule,
    fetch_schedule_sql,
    schedule_stats,
)

URLS = [
    "HTTP://Example.COM:80/a/b/?utm_source=x&page=2&gclid=9#frag",
    "http://example.com/a/b?page=2",
    "https://Example.com:443/",
    "https://example.com/",
    "https://example.com",
    "http://other.org/path/?ref=tw&z=1&a=2",
    "http://other.org/path?a=2&z=1",
    "https://example.com:8443/keep:port",
    "http://example.com/x?utm=1&utm_medium=email",
    "ftp://Files.Example.com/Data/",
]


def _df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_canonical_matches_python_twin(spark):
    got = {
        r["url"]: r["canonical_url"]
        for r in canonicalize_urls(_df(spark)).collect()
    }
    assert got == {u: canonical_url_py(u) for u in URLS}


def test_canonical_matches_duckdb_twin(spark):
    got = {
        r["url"]: r["canonical_url"]
        for r in canonicalize_urls(_df(spark)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in URLS])
    expr = canonical_url_sql("url")
    oracle = dict(
        con.execute(f"SELECT url, {expr} FROM u").fetchall()
    )
    assert got == oracle


def test_canonical_rules():
    # tracking stripped, params sorted, fragment gone, default port
    # gone, scheme+host lowercased, trailing slash dropped
    assert (
        canonical_url_py(URLS[0]) == "http://example.com/a/b?page=2"
    )
    # the two spellings collapse
    assert canonical_url_py(URLS[0]) == canonical_url_py(URLS[1])
    assert canonical_url_py(URLS[2]) == "https://example.com/"
    # root path keeps its slash; bare host stays bare
    assert canonical_url_py(URLS[3]) == "https://example.com/"
    assert canonical_url_py(URLS[4]) == "https://example.com"
    # non-default port kept; path case preserved
    assert (
        canonical_url_py(URLS[7]) == "https://example.com:8443/keep:port"
    )
    # all-tracking query drops the '?'
    assert canonical_url_py(URLS[8]) == "http://example.com/x"
    # non-http scheme untouched except case/slash rules
    assert canonical_url_py(URLS[9]) == "ftp://files.example.com/Data"


def test_canon_group_counts(spark):
    rows = canonicalize_urls(_df(spark)).collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical_url"], []).append(r["canon_group"])
    for canon, groups in by_canon.items():
        assert all(g == len(groups) for g in groups)


def test_schedule_matches_duckdb_twin(spark):
    canon = canonicalize_urls(_df(spark)).select(
        "canonical_url"
    ).distinct()
    sched = fetch_schedule(canon, max_per_host=3)
    got = sorted(
        (r["url"], r["host"], r["slot"]) for r in sched.collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in URLS])
    expr = canonical_url_sql("url")
    sql = fetch_schedule_sql(
        f"SELECT DISTINCT {expr} AS url FROM u", max_per_host=3
    )
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == oracle


def test_schedule_politeness_invariant(spark):
    # within any slot, each host appears at most once
    canon = canonicalize_urls(_df(spark)).select("canonical_url").distinct()
    sched = fetch_schedule(canon).collect()
    seen = set()
    for r in sched:
        key = (r["host"], r["slot"])
        assert key not in seen
        seen.add(key)
    # slots within a host are dense from 0
    hosts = {}
    for r in sched:
        hosts.setdefault(r["host"], []).append(r["slot"])
    for slots in hosts.values():
        assert sorted(slots) == list(range(len(slots)))


def test_schedule_stats_and_cap(spark):
    canon = canonicalize_urls(_df(spark)).select("canonical_url").distinct()
    capped = fetch_schedule(canon, max_per_host=1)
    stats = {r["slot"]: r["n_urls"] for r in schedule_stats(capped).collect()}
    assert set(stats) == {0}
    with pytest.raises(ValueError):
        fetch_schedule(canon, max_per_host=0)
