"""1-WL color refinement + graph signatures (operators/wl.py) vs the
Python and DuckDB twins, isomorphism behavior, and known WL limits."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.wl import (
    structural_dup_groups,
    wl_colors,
    wl_colors_py,
    wl_colors_sql,
    wl_signatures,
)


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(gid=str(g), subject=str(a), object=str(b)) for g, a, b in triples]
    )


def _collect(df):
    return {
        (r["graph_id"], r["node"]): r["color"] for r in df.collect()
    }


CHAIN = [("g", "a", "b"), ("g", "b", "c"), ("g", "c", "d")]
STAR = [("g", "hub", f"l{i}") for i in range(4)]


def test_matches_python_twin(spark):
    got = _collect(
        wl_colors(_edges(spark, CHAIN + STAR), rounds=3, graph_col="gid")
    )
    # CHAIN and STAR share graph id 'g' here — one merged graph
    assert got == wl_colors_py(CHAIN + STAR, rounds=3)


def test_matches_duckdb_twin(spark):
    triples = CHAIN + [("g", "b", "x"), ("g", "x", "d")]
    got = _collect(
        wl_colors(_edges(spark, triples), rounds=3, graph_col="gid")
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)", [(a, b) for _g, a, b in triples]
    )
    sql = wl_colors_sql("SELECT src, dst FROM e", rounds=3)
    oracle = {
        (r[0], r[1]): r[2] for r in con.execute(sql).fetchall()
    }
    assert got == oracle


def test_structural_roles(spark):
    # chain a-b-c-d: ends {a,d} share a color, middles {b,c} share a
    # color, and ends != middles after 2 rounds
    got = _collect(wl_colors(_edges(spark, CHAIN), rounds=2, graph_col="gid"))
    assert got[("g", "a")] == got[("g", "d")]
    assert got[("g", "b")] == got[("g", "c")]
    assert got[("g", "a")] != got[("g", "b")]


def test_isomorphic_graphs_share_signature(spark):
    # same 4-chain under two different node namings
    g1 = [("p", "a", "b"), ("p", "b", "c"), ("p", "c", "d")]
    g2 = [("q", "w", "x"), ("q", "x", "y"), ("q", "y", "z")]
    g3 = [("r", "hub", f"l{i}") for i in range(3)]  # star: different
    sigs = {
        r["graph_id"]: (r["signature"], r["n_nodes"])
        for r in wl_signatures(
            wl_colors(_edges(spark, g1 + g2 + g3), rounds=3, graph_col="gid")
        ).collect()
    }
    assert sigs["p"] == sigs["q"]
    assert sigs["p"] != sigs["r"]
    groups = structural_dup_groups(
        wl_signatures(
            wl_colors(_edges(spark, g1 + g2 + g3), rounds=3, graph_col="gid")
        )
    ).collect()
    assert len(groups) == 1 and groups[0]["graph_ids"] == ["p", "q"]


def test_known_wl_blind_spot_documented(spark):
    # C6 vs 2xC3: 1-WL CANNOT distinguish these (every node sees two
    # neighbors forever). The shared signature is the documented
    # limitation, pinned so a future "fix" that silently changes
    # semantics fails loudly.
    c6 = [("c6", f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    cc3 = [("d", f"a{i}", f"a{(i + 1) % 3}") for i in range(3)] + [
        ("d", f"b{i}", f"b{(i + 1) % 3}") for i in range(3)
    ]
    sigs = {
        r["graph_id"]: r["signature"]
        for r in wl_signatures(
            wl_colors(_edges(spark, c6 + cc3), rounds=4, graph_col="gid")
        ).collect()
    }
    assert sigs["c6"] == sigs["d"]


def test_initial_labels_break_symmetry(spark):
    labels = None
    got_plain = _collect(
        wl_colors(_edges(spark, CHAIN), rounds=0, graph_col="gid")
    )
    assert len(set(got_plain.values())) == 1  # unlabeled start: 1 color
    lab = _edges(spark, CHAIN).sparkSession.createDataFrame(
        [Row(gid="g", node="a", label="PERSON")]
    )
    got = _collect(
        wl_colors(
            _edges(spark, CHAIN),
            rounds=0,
            graph_col="gid",
            labels=lab,
        )
    )
    assert got[("g", "a")] != got[("g", "b")]
    assert labels is None  # silence lint


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        wl_colors(_edges(spark, CHAIN), rounds=-1, graph_col="gid")
    with pytest.raises(ValueError):
        wl_colors_sql("SELECT 1 AS src, 2 AS dst", rounds=-1)
