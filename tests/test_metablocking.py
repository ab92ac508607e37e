"""Meta-blocking WEP/CNP pruning (operators/metablocking.py) vs the
Python and DuckDB twins."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.operators.metablocking import (
    meta_blocking,
    meta_blocking_py,
    meta_blocking_sql,
    pruned_same_as_edges,
)

ENTS = [
    (1, "acme widget factory east"),
    (2, "acme widget factory west"),
    (3, "acme widget co"),
    (4, "globex heavy industries"),
    (5, "globex heavy industry"),
    (6, "initech paper supplies"),
    (7, "initech paper supply co"),
    (8, "acme globex joint venture"),
    (9, "unrelated singleton name"),
]


def _df(spark):
    return spark.createDataFrame(ENTS, "id long, name string")


def _collect(df):
    return sorted(
        (
            r["id_a"],
            r["id_b"],
            r["common_blocks"],
            r["js_micro"],
            r["keep_wep"],
            r["keep_cnp"],
        )
        for r in df.collect()
    )


def test_matches_python_twin(spark):
    got = _collect(meta_blocking(_df(spark), top_k=2))
    assert got == meta_blocking_py(ENTS, top_k=2)


def test_matches_duckdb_twin(spark):
    got = _collect(meta_blocking(_df(spark), top_k=2))
    con = duckdb.connect()
    con.execute("CREATE TABLE ent(id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO ent VALUES (?, ?)", ENTS)
    sql = meta_blocking_sql("SELECT id, name FROM ent", top_k=2)
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == oracle


def test_wep_keeps_only_above_mean(spark):
    rows = _collect(meta_blocking(_df(spark), top_k=2))
    tot = sum(r[3] for r in rows)
    m = len(rows)
    for _a, _b, _c, js, wep, _cnp in rows:
        assert wep == (1 if js * m > tot else 0)


def test_cnp_respects_top_k(spark):
    # with top_k=1 every entity retains at most its single best edge,
    # so the kept graph has at most one edge per endpoint ORIENTATION
    rows = _collect(meta_blocking(_df(spark), top_k=1))
    kept = [(a, b) for a, b, _c, _js, _w, c in rows if c == 1]
    # each kept edge must be the best for at least one endpoint
    best = {}
    for a, b, _c, js, _w, _cnp in rows:
        for src, dst in ((a, b), (b, a)):
            cur = best.get(src)
            if cur is None or (-js, dst) < (-cur[0], cur[1]):
                best[src] = (js, dst)
    for a, b in kept:
        assert best[a][1] == b or best[b][1] == a


def test_pruned_edges_schemes(spark):
    g = meta_blocking(_df(spark), top_k=2)
    wep = pruned_same_as_edges(g, "wep").count()
    cnp = pruned_same_as_edges(g, "cnp").count()
    both = pruned_same_as_edges(g, "both").count()
    assert both <= min(wep, cnp)
    assert cnp <= g.count()
    with pytest.raises(ValueError):
        pruned_same_as_edges(g, "nope")


def test_top_k_validation(spark):
    with pytest.raises(ValueError):
        meta_blocking(_df(spark), top_k=0)
