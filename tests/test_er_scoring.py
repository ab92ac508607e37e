"""Fellegi–Sunter ER scoring (operators/er_scoring.py): hand-checked
smoothed rates and micro-weights, decision thresholds, python twin,
DuckDB end-to-end twin, guards, and the zero-join scoring plan."""

from __future__ import annotations

import math

import duckdb
import pytest

from kg_microbe_merge_spark.operators.er_scoring import (
    MICRO,
    fs_score,
    fs_sql,
    fs_weights,
)

L = "a string, b string, name_eq int, seg_eq int, is_match int"

LABELED = [
    ("a1", "b1", 1, 1, 1),
    ("a2", "b2", 1, 0, 1),
    ("a3", "b3", 1, 1, 1),
    ("a4", "b4", 0, 1, 0),
    ("a5", "b5", 0, 0, 0),
    ("a6", "b6", 1, 0, 0),
    ("a7", "b7", 0, 1, 0),
]


def _w(am, nm, au, nu):
    m = (am + 1) / (nm + 2)
    u = (au + 1) / (nu + 2)
    return (
        math.floor(math.log(m / u) * MICRO + 0.5),
        math.floor(math.log((1 - m) / (1 - u)) * MICRO + 0.5),
    )


def test_weights_hand_values(spark):
    w = {
        r["feature"]: (
            r["m_num"], r["m_den"], r["u_num"], r["u_den"],
            r["w_agree_micro"], r["w_disagree_micro"],
        )
        for r in fs_weights(
            spark.createDataFrame(LABELED, L), ["name_eq", "seg_eq"]
        ).collect()
    }
    # name_eq: agrees in 3/3 matches, 1/4 unmatches
    wa, wd = _w(3, 3, 1, 4)
    assert w["name_eq"] == (4, 5, 2, 6, wa, wd)
    assert w["name_eq"][4] > 0 > w["name_eq"][5]
    # seg_eq: 2/3 matches, 2/4 unmatches — weakly informative
    wa2, wd2 = _w(2, 3, 2, 4)
    assert w["seg_eq"][4:] == (wa2, wd2)
    assert abs(w["seg_eq"][4]) < abs(w["name_eq"][4])
    with pytest.raises(ValueError):
        fs_weights(spark.createDataFrame(LABELED, L), [])


def test_score_and_decisions(spark):
    df = spark.createDataFrame(LABELED, L)
    w = fs_weights(df, ["name_eq", "seg_eq"])
    wa, wd = _w(3, 3, 1, 4)
    wa2, wd2 = _w(2, 3, 2, 4)
    top = wa + wa2
    bottom = wd + wd2
    out = {
        (r["a"], r["b"]): (r["score_micro"], r["decision"])
        for r in fs_score(df, w, upper_micro=top, lower_micro=bottom).collect()
    }
    assert out[("a1", "b1")] == (top, "match")
    assert out[("a5", "b5")] == (bottom, "nonmatch")
    assert out[("a2", "b2")][1] == "possible"
    with pytest.raises(ValueError):
        fs_score(df, w, upper_micro=0, lower_micro=1)


def test_vs_duckdb(spark):
    df = spark.createDataFrame(LABELED, L)
    w = fs_weights(df, ["name_eq", "seg_eq"])
    got = sorted(
        map(tuple, fs_score(df, w, 500_000, -500_000).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lab (a VARCHAR, b VARCHAR, name_eq INT, seg_eq INT, is_match INT)"
    )
    con.executemany("INSERT INTO lab VALUES (?, ?, ?, ?, ?)", LABELED)
    oracle = sorted(
        map(
            tuple,
            con.execute(
                fs_sql("lab", "lab", ["name_eq", "seg_eq"], 500_000, -500_000)
            ).fetchall(),
        )
    )
    assert got == oracle


def test_scoring_plan_zero_joins(spark):
    df = spark.createDataFrame(LABELED, L)
    w = fs_weights(df, ["name_eq", "seg_eq"])
    plan = (
        fs_score(df, w, 1, 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_em_recovers_planted_parameters(spark):
    """Two planted classes (matches: features agree w.p. .9/.85;
    unmatches: .15/.1; 20% prevalence) — EM over the pattern counts
    must recover rates within a few points and separate the classes,
    and its log-likelihood must be non-decreasing iteration over
    iteration."""
    import random

    from kg_microbe_merge_spark.operators.er_scoring import (
        agreement_patterns,
        fs_em_weights,
    )

    rng = random.Random(5)
    rows = []
    for i in range(4000):
        is_match = rng.random() < 0.2
        f1 = int(rng.random() < (0.9 if is_match else 0.15))
        f2 = int(rng.random() < (0.85 if is_match else 0.1))
        rows.append((f"p{i}", f1, f2))
    df = spark.createDataFrame(rows, "pid string, f1 int, f2 int")

    pats = {
        (r["f1"], r["f2"]): r["n"]
        for r in agreement_patterns(df, ["f1", "f2"]).collect()
    }
    assert sum(pats.values()) == 4000 and len(pats) == 4

    w, params = fs_em_weights(df, ["f1", "f2"], iterations=50)
    assert abs(params["p"] - 0.2) < 0.08
    assert abs(params["m"]["f1"] - 0.9) < 0.1
    assert abs(params["u"]["f1"] - 0.15) < 0.1
    wr = {r["feature"]: r for r in w.collect()}
    assert wr["f1"]["w_agree_micro"] > 0 > wr["f1"]["w_disagree_micro"]

    # monotone log-likelihood (EM guarantee)
    prev = float("-inf")
    for it in (1, 2, 5, 10, 25):
        _, pr = fs_em_weights(df, ["f1", "f2"], iterations=it)
        assert pr["loglik"] >= prev - 1e-9
        prev = pr["loglik"]

    # deterministic
    _, p2 = fs_em_weights(df, ["f1", "f2"], iterations=50)
    assert p2 == params


def test_em_weights_drive_fs_score(spark):
    """EM weights slot straight into fs_score (same column contract)."""
    from kg_microbe_merge_spark.operators.er_scoring import (
        fs_em_weights,
        fs_score,
    )

    rows = [(f"p{i}", i % 2, (i // 2) % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "pid string, f1 int, f2 int")
    w, _ = fs_em_weights(df, ["f1", "f2"], iterations=5)
    out = fs_score(df, w, upper_micro=10**9, lower_micro=-(10**9))
    assert out.count() == 40
    assert set(out.select("decision").distinct().toPandas()["decision"]) <= {
        "match", "possible", "nonmatch"
    }
