"""Transitive closure by path doubling (operators/closure.py):
chain/DAG/cycle semantics, networkx + recursive-CTE oracles,
ancestor rollup, convergence guard."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.operators.closure import (
    ClosureConvergenceError,
    ancestor_counts,
    closure_sql,
    incremental_closure,
    transitive_closure,
)

E = "src long, dst long"


def _pairs(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def test_chain_dag_cycle_semantics(spark):
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], E
    )
    assert _pairs(transitive_closure(chain)) == [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)
    ]
    # diamond: duplicate derivations collapse
    diamond = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], E
    )
    assert _pairs(transitive_closure(diamond)) == [
        (1, 2), (1, 3), (1, 4), (2, 4), (3, 4)
    ]
    # 3-cycle: everything reaches everything, including itself
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], E)
    assert _pairs(transitive_closure(cyc)) == [
        (a, b) for a in (1, 2, 3) for b in (1, 2, 3)
    ]
    # self-loop and empty input
    assert _pairs(
        transitive_closure(spark.createDataFrame([(5, 5)], E))
    ) == [(5, 5)]
    assert transitive_closure(spark.createDataFrame([], E)).count() == 0


def test_random_dag_vs_networkx_and_duckdb(spark):
    networkx = pytest.importorskip("networkx")
    import random

    rng = random.Random(11)
    # forward-only edges => DAG; ~2 parents per node, depth ~ tens
    edges = sorted(
        {
            (rng.randrange(0, j), j)
            for j in range(1, 120)
            for _ in range(2)
        }
    )
    got = set(
        _pairs(transitive_closure(spark.createDataFrame(edges, E)))
    )
    g = networkx.DiGraph(edges)
    want = {
        (u, v) for u in g for v in networkx.descendants(g, u)
    }
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    oracle = set(
        con.execute(
            f"WITH RECURSIVE {closure_sql('e')} SELECT src, dst FROM r"
        ).fetchall()
    )
    assert got == oracle


def test_ancestor_counts(spark):
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], E)
    got = {
        r["node"]: (r["n_ancestors"], r["n_descendants"])
        for r in ancestor_counts(chain).collect()
    }
    # naming: src-side count = pairs where node is the SOURCE
    # (its reachable set, i.e. ancestors when edges point child->parent)
    assert got == {
        1: (3, 0), 2: (2, 1), 3: (1, 2), 4: (0, 3)
    }


def test_incremental_fold_equals_full_reclosure(spark):
    """The oracle invariant: folding a delta into a closed relation ≡
    re-closing everything, across chain-bridging, cycle-forming,
    duplicate and empty deltas."""
    import random

    rng = random.Random(41)
    base_edges = sorted(
        {(rng.randrange(0, j), j) for j in range(1, 60) for _ in range(2)}
    )
    # delta: forward bridges + a back edge (forms cycles) + a dup
    delta_edges = [(3, 45), (61, 62), (50, 2), base_edges[0]]
    closed = transitive_closure(spark.createDataFrame(base_edges, E))
    folded = incremental_closure(
        closed, spark.createDataFrame(delta_edges, E)
    )
    full = transitive_closure(
        spark.createDataFrame(sorted(set(base_edges) | set(delta_edges)), E)
    )
    assert _pairs(folded) == _pairs(full)


def test_incremental_noop_and_empty_delta(spark):
    chain = spark.createDataFrame([(1, 2), (2, 3)], E)
    closed = transitive_closure(chain)
    want = _pairs(closed)
    # delta already entailed by the closure: nothing changes
    dup = spark.createDataFrame([(1, 3)], E)
    assert _pairs(incremental_closure(closed, dup)) == want
    empty = spark.createDataFrame([], E)
    assert _pairs(incremental_closure(closed, empty)) == want


def test_incremental_chained_folds(spark):
    """Two successive folds ≡ one re-closure over everything — the
    resumability property (each fold's output is a valid snapshot)."""
    c = transitive_closure(spark.createDataFrame([(1, 2), (3, 4)], E))
    c = incremental_closure(c, spark.createDataFrame([(2, 3)], E))
    c = incremental_closure(c, spark.createDataFrame([(4, 5)], E))
    full = transitive_closure(
        spark.createDataFrame([(1, 2), (3, 4), (2, 3), (4, 5)], E)
    )
    assert _pairs(c) == _pairs(full)


def test_convergence_guard(spark):
    longchain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], E
    )
    with pytest.raises(ClosureConvergenceError):
        transitive_closure(longchain, max_iterations=1)
    with pytest.raises(ValueError):
        transitive_closure(longchain, max_iterations=0)
