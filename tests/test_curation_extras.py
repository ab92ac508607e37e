"""PII scrub, URL parsing, and TF-IDF top-k (round-3 curation family)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.pii import (
    PII_ORDER,
    PII_PATTERNS,
    has_pii,
    pii_count,
    redact_pii,
)
from kg_microbe_merge_spark.functions.urls import (
    domain_rollup,
    path_depth,
    query_param,
    registered_domain,
    url_host,
    url_path,
)
from kg_microbe_merge_spark.operators.tfidf import tfidf_topk


# ---------------------------------------------------------------------------
# PII


def _pii_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_pii_redaction_basic(spark):
    df = _pii_df(
        spark,
        [
            "mail me at jane.doe+x@sub.example.co.uk today",
            "call 555-123-4567 or 555.987.6543",
            "server at 192.168.0.1 answered",
            "ssn 219-09-9999 on file",
            "clean text with no pii at all",
        ],
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("red"),
            has_pii(F.col("text")).alias("flag"),
        ).collect()
    }
    assert out[0].red == "mail me at <EMAIL> today"
    assert out[1].red == "call <PHONE> or <PHONE>"
    assert out[2].red == "server at <IP> answered"
    assert out[3].red == "ssn <SSN> on file"
    assert out[4].red == "clean text with no pii at all"
    assert [out[i].flag for i in range(5)] == [True, True, True, True, False]


def test_pii_counts_and_null(spark):
    df = spark.createDataFrame(
        [(0, "a@b.com c@d.org 1.2.3.4"), (1, None)], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_count(F.col("text"), "email").alias("ne"),
            pii_count(F.col("text"), "ipv4").alias("ni"),
        ).collect()
    }
    assert (rows[0].ne, rows[0].ni) == (2, 1)
    assert (rows[1].ne, rows[1].ni) == (0, 0)  # null text → 0, not null


def test_pii_ssn_wins_over_phone():
    """Order contract: SSN (3-2-4) redacts before phone (3-3-4); the
    shapes are disjoint so order never changes output today, but the
    order is pinned for future overlapping patterns."""
    assert PII_ORDER.index("ssn") < PII_ORDER.index("phone")
    assert set(PII_PATTERNS) == set(PII_ORDER)


def test_pii_scrub_is_zero_shuffle(spark):
    df = _pii_df(spark, ["x@y.com"] * 4)
    plan = df.select(
        redact_pii(F.col("text")).alias("r")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# URLs


def test_url_parts(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.news.Example.com/x/y/z?utm=c7&b=2"),
            (1, "http://example.org"),
            (2, "not a url"),
        ],
        ["i", "url"],
    )
    u = F.col("url")
    rows = {
        r.i: r
        for r in df.select(
            "i",
            url_host(u).alias("host"),
            registered_domain(u).alias("dom"),
            url_path(u).alias("path"),
            path_depth(u).alias("depth"),
            query_param(u, "utm").alias("utm"),
            query_param(u, "missing").alias("m"),
        ).collect()
    }
    assert rows[0].host == "a.news.example.com"
    assert rows[0].dom == "example.com"
    assert rows[0].path == "/x/y/z"
    assert rows[0].depth == 3
    assert rows[0].utm == "c7"
    assert rows[0].m is None
    assert rows[1].host == "example.org"
    assert rows[1].dom == "example.org"
    assert (rows[1].path, rows[1].depth) == ("", 0)
    assert rows[2].host == "" and rows[2].dom == ""


def test_domain_rollup(spark):
    df = spark.createDataFrame(
        [
            ("https://a.x.com/p",),
            ("https://b.x.com/p/q",),
            ("https://a.x.com/",),
            ("https://only.y.org/1/2/3",),
        ],
        ["url"],
    )
    out = {r.domain: r for r in domain_rollup(df).collect()}
    assert out["x.com"].n_pages == 3
    assert out["x.com"].n_hosts == 2
    assert abs(out["x.com"].avg_depth - 1.0) < 1e-9  # (1+2+0)/3
    assert out["y.org"].n_pages == 1 and out["y.org"].avg_depth == 3.0


# ---------------------------------------------------------------------------
# TF-IDF


def _py_tfidf(docs: dict[int, str], k: int = 3, min_len: int = 2):
    import re

    toks = {
        d: [
            t
            for t in re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
            if len(t) >= min_len
        ]
        for d, txt in docs.items()
    }
    tf = {
        (d, t): ts.count(t) for d, ts in toks.items() for t in set(ts)
    }
    dfreq: dict[str, int] = {}
    for (_, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    n = len(docs)
    w = {
        (d, t): round(c * (math.log((n + 1.0) / (dfreq[t] + 1.0)) + 1.0), 6)
        for (d, t), c in tf.items()
    }
    out = {}
    for d in docs:
        terms = sorted(
            [t for (dd, t) in w if dd == d],
            key=lambda t: (-w[(d, t)], t),
        )
        out[d] = [(t, w[(d, t)]) for t in terms[:k]]
    return out


def test_tfidf_matches_python_model(spark):
    docs = {
        0: "spark shuffles the big table while spark broadcasts the small",
        1: "the quick brown fox jumps over the lazy dog",
        2: "spark spark spark tuning guide",
        3: "",
    }
    df = spark.createDataFrame(
        list(docs.items()), ["doc_id", "text"]
    )
    got = tfidf_topk(df, k=3)
    expected = _py_tfidf(docs)
    rows = sorted(
        [(r.doc_id, r.term, r.weight, r.rank) for r in got.collect()]
    )
    exp_rows = sorted(
        (d, t, w, i + 1)
        for d, pairs in expected.items()
        for i, (t, w) in enumerate(pairs)
    )
    assert rows == exp_rows
    # empty doc yields no rows
    assert all(r[0] != 3 for r in rows)


def test_tfidf_rank_is_total_order(spark):
    # two terms with identical weight: term asc breaks the tie
    df = spark.createDataFrame(
        [(0, "zz aa"), (1, "qq rr")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.rank): r.term for r in tfidf_topk(df, k=2).collect()
    }
    assert got[(0, 1)] == "aa" and got[(0, 2)] == "zz"
    assert got[(1, 1)] == "qq" and got[(1, 2)] == "rr"
