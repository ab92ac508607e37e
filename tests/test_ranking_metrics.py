"""Ranking evaluation (operators/linkpred.ranking_metrics): rank
semantics under the deterministic (score desc, candidate asc) order,
tie handling, missing-truth exclusion, hits columns, and the DuckDB
twin on a random scored table."""

from __future__ import annotations

import random

import duckdb

from kg_microbe_merge_spark.operators.linkpred import (
    ranking_metrics,
    ranking_metrics_sql,
)

S = "query string, candidate string, score_micro long"
T = "query string, candidate string"

SCORED = [
    ("q1", "a", 900), ("q1", "b", 800), ("q1", "c", 700),
    # q2: tie at the top — candidate id breaks it
    ("q2", "a", 500), ("q2", "b", 500), ("q2", "c", 100),
    # q3: truth absent from scored
    ("q3", "a", 1), ("q3", "b", 2),
]
TRUTH = [("q1", "b"), ("q2", "b"), ("q3", "z")]


def _got(df):
    return {
        r["query"]: (r["rank"], r["rr_micro"], r["hits_1"], r["hits_3"])
        for r in df.collect()
    }


def test_hand_values(spark):
    out = ranking_metrics(
        spark.createDataFrame(SCORED, S),
        spark.createDataFrame(TRUTH, T),
        hits_at=(1, 3),
    )
    got = _got(out)
    # q1: b is second (900 > 800) -> rank 2, rr 500000
    # q2: tie 500/500, 'a' < 'b' ranks first -> b rank 2
    # q3: truth 'z' unscored -> no row
    assert got == {
        "q1": (2, 500000, 0, 1),
        "q2": (2, 500000, 0, 1),
    }
    # rank-3 rounding: floor(1e6/3 + 0.5) = 333833? no: 333333.83 -> 333334? (1e6/3=333333.33 +0.5 -> 333333.83 floor 333333)
    one = ranking_metrics(
        spark.createDataFrame(
            [("q", "a", 3), ("q", "b", 2), ("q", "c", 1)], S
        ),
        spark.createDataFrame([("q", "c")], T),
        hits_at=(1, 3),
    ).collect()[0]
    assert one["rank"] == 3 and one["rr_micro"] == 333333


def test_vs_duckdb(spark):
    rng = random.Random(13)
    scored = [
        (f"q{i}", f"c{j}", rng.randrange(0, 50))
        for i in range(30)
        for j in range(rng.randrange(2, 12))
    ]
    truth = [
        (f"q{i}", f"c{rng.randrange(0, 12)}") for i in range(30)
    ]
    got = sorted(
        map(
            tuple,
            ranking_metrics(
                spark.createDataFrame(scored, S),
                spark.createDataFrame(truth, T),
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s (query VARCHAR, candidate VARCHAR, score_micro BIGINT)"
    )
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", scored)
    con.execute("CREATE TABLE t (query VARCHAR, candidate VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", truth)
    oracle = sorted(
        map(
            tuple,
            con.execute(ranking_metrics_sql("s", "t")).fetchall(),
        )
    )
    assert got == oracle
