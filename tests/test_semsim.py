"""IC / Resnik / Lin semantic similarity (operators/semsim.py):
hand-checked values on a textbook taxonomy, a naive Python model over
random DAGs, the DuckDB SQL twins, degenerate conventions, and the
broadcast-only plan shape."""

from __future__ import annotations

import math
import random

import duckdb

from kg_microbe_merge_spark.operators.closure import transitive_closure
from kg_microbe_merge_spark.operators.semsim import (
    MICRO,
    ic_sql,
    information_content,
    lin_similarity,
    lin_sql,
    reflexive,
    resnik_similarity,
)

E = "src string, dst string"

#: child -> parent (Resnik's classic coin/money shape)
TAXO = [
    ("nickel", "coin"),
    ("dime", "coin"),
    ("coin", "cash"),
    ("credit", "cash"),
    ("cash", "money"),
]

#: entity -> term annotations; 8 distinct entities
ANN = [
    ("e1", "nickel"),
    ("e2", "nickel"),
    ("e3", "dime"),
    ("e4", "coin"),
    ("e5", "credit"),
    ("e6", "credit"),
    ("e7", "cash"),
    ("e8", "money"),
    ("e1", "dime"),  # e1 twice under coin: distinct-entity freq
]


def _micro(x: float) -> int:
    return math.floor(x * MICRO + 0.5)


def _model_ic(ann, edges):
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)

    def ancs(t):
        out, stack = {t}, [t]
        while stack:
            for p in parents.get(stack.pop(), ()):
                if p not in out:
                    out.add(p)
                    stack.append(p)
        return out

    n = len({e for e, _ in ann})
    freq = {}
    for e, t in ann:
        for a in ancs(t):
            freq.setdefault(a, set()).add(e)
    return (
        {t: len(s) for t, s in freq.items()},
        {t: _micro(-math.log(len(s) / n)) for t, s in freq.items()},
        ancs,
        n,
    )


def _setup(spark, edges, ann):
    clo = reflexive(transitive_closure(spark.createDataFrame(edges, E)))
    a = spark.createDataFrame(ann, "entity string, term string")
    return clo, a, information_content(a, clo)


def test_ic_hand_values(spark):
    clo, a, ic = _setup(spark, TAXO, ANN)
    got = {r["term"]: (r["freq"], r["ic_micro"]) for r in ic.collect()}
    freq, icm, _, _ = _model_ic(ANN, TAXO)
    assert got == {t: (freq[t], icm[t]) for t in freq}
    assert got["money"] == (8, 0)  # root: every entity, IC 0
    assert got["coin"][0] == 4  # e1..e4 (e1 deduped)
    assert got["nickel"] == (2, _micro(-math.log(2 / 8)))


def test_resnik_lin_hand_values(spark):
    clo, a, ic = _setup(spark, TAXO, ANN)
    pairs = spark.createDataFrame(
        [("nickel", "dime"), ("nickel", "credit"), ("nickel", "money")],
        "a string, b string",
    )
    freq, icm, _, _ = _model_ic(ANN, TAXO)
    res = {
        (r["a"], r["b"]): r["resnik_micro"]
        for r in resnik_similarity(pairs, clo, ic).collect()
    }
    assert res[("nickel", "dime")] == icm["coin"]  # MICA = coin
    assert res[("nickel", "credit")] == icm["cash"]
    assert res[("nickel", "money")] == icm["money"]  # root, 0
    lin = {
        (r["a"], r["b"]): (r["resnik_micro"], r["lin_micro"])
        for r in lin_similarity(pairs, clo, ic).collect()
    }
    want_nd = math.floor(
        2.0 * MICRO * icm["coin"] / (icm["nickel"] + icm["dime"]) + 0.5
    )
    assert lin[("nickel", "dime")] == (icm["coin"], want_nd)
    # degenerate: both ends the root -> lin 0 by convention
    root_pair = spark.createDataFrame([("money", "money")], "a string, b string")
    assert lin_similarity(root_pair, clo, ic).collect()[0]["lin_micro"] == 0


def test_random_dag_vs_model_and_duckdb(spark):
    rng = random.Random(23)
    terms = [f"t{i}" for i in range(30)]
    # forward edges only => DAG; every node links to >=1 earlier node
    edges = sorted(
        {
            (terms[j], terms[rng.randrange(0, j)])
            for j in range(1, 30)
            for _ in range(2)
        }
    )
    ann = [
        (f"e{i}", terms[rng.randrange(0, 30)]) for i in range(60)
    ]
    pairs = sorted(
        {
            (terms[rng.randrange(0, 30)], terms[rng.randrange(0, 30)])
            for _ in range(40)
        }
    )
    clo, a, ic = _setup(spark, edges, ann)
    freq, icm, ancs, n = _model_ic(ann, edges)
    got_ic = {r["term"]: (r["freq"], r["ic_micro"]) for r in ic.collect()}
    assert got_ic == {t: (freq[t], icm[t]) for t in freq}

    pdf = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["resnik_micro"], r["lin_micro"])
        for r in lin_similarity(pdf, clo, ic).collect()
    }
    want = {}
    for x, y in pairs:
        common = [
            icm[c] for c in ancs(x) & ancs(y) if c in icm
        ]
        if not common or x not in icm or y not in icm:
            continue
        r = max(common)
        denom = icm[x] + icm[y]
        want[(x, y)] = (
            r,
            0 if denom == 0 else math.floor(2.0 * MICRO * r / denom + 0.5),
        )
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ann (entity VARCHAR, term VARCHAR)")
    con.executemany("INSERT INTO ann VALUES (?, ?)", ann)
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE p (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    oracle = con.execute(f"""
        WITH RECURSIVE
        r(src, dst) AS (
            SELECT src, dst FROM e
            UNION
            SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
        n AS (SELECT src AS t FROM e UNION SELECT dst FROM e),
        clo AS (SELECT src, dst FROM r UNION SELECT t, t FROM n),
        {ic_sql('ann', 'clo')}
        {lin_sql('p', 'clo')}
    """).fetchall()
    assert {(a_, b_): (rm, lm) for a_, b_, rm, lm in oracle} == want


def test_plan_broadcast_only(spark):
    clo, a, ic = _setup(spark, TAXO, ANN)
    pairs = spark.createDataFrame([("nickel", "dime")], "a string, b string")
    plan = (
        lin_similarity(pairs, clo, ic)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
