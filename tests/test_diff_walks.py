"""KG snapshot diff (operators/diff.py) and deterministic random walks
(operators/walks.py): hand-checkable semantics, python-twin
equivalence, fold≡rebuild audit composition, sink termination,
degree capping, and determinism across re-runs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.diff import (
    assert_snapshots_equal,
    snapshot_diff,
)
from kg_microbe_merge_spark.operators.walks import (
    random_walks,
    ranked_edges,
    skipgram_pairs,
    walks_py,
)


# --- snapshot diff --------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, price=p) for i, n, p in rows]
    )


def test_diff_added_removed_changed(spark):
    old = _snap(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    new = _snap(spark, [(2, "b", 21.0), (3, "c", 30.0), (4, "d", 40.0)])
    got = {
        r["id"]: (r["change"], r["changed_cols"])
        for r in snapshot_diff(old, new).collect()
    }
    # id 3 unchanged → absent
    assert got == {
        1: ("removed", ""),
        2: ("changed", "price"),
        4: ("added", ""),
    }


def test_diff_multi_column_and_null_safety(spark):
    old = _snap(spark, [(1, None, 10.0), (2, "b", None)])
    new = _snap(spark, [(1, None, 10.0), (2, "B", None)])
    got = {
        r["id"]: (r["change"], r["changed_cols"])
        for r in snapshot_diff(old, new).collect()
    }
    # null == null must be "unchanged", not a diff
    assert got == {2: ("changed", "name")}
    new2 = _snap(spark, [(1, "x", 11.0), (2, "b", None)])
    got2 = {
        r["id"]: r["changed_cols"]
        for r in snapshot_diff(old, new2).collect()
    }
    assert got2 == {1: "name,price"}  # sorted col order


def test_diff_identical_snapshots_is_empty_and_audit_passes(spark):
    s = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    assert snapshot_diff(s, s).count() == 0
    assert_snapshots_equal(s, s)
    with pytest.raises(AssertionError):
        assert_snapshots_equal(s, _snap(spark, [(1, "a", 1.0)]))


# --- random walks ---------------------------------------------------------

_EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
    ("c", "a"), ("d", "a"), ("d", "e"),
    # e is a sink
]


def _edges_df(spark, edges=_EDGES):
    return spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edges]
    )


def test_walks_match_python_twin(spark):
    starts = spark.createDataFrame([Row(id=x) for x in "abcde"])
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(_edges_df(spark), starts, steps=5).collect()
    )
    assert got == sorted(walks_py(_EDGES, list("abcde"), steps=5))


def test_walk_terminates_at_sink(spark):
    starts = spark.createDataFrame([Row(id="e")])
    rows = random_walks(_edges_df(spark), starts, steps=4).collect()
    assert [(r["step"], r["node"]) for r in rows] == [(0, "e")]


def test_walks_deterministic_across_runs(spark):
    starts = spark.createDataFrame([Row(id="a"), Row(id="b")])
    r1 = sorted(map(tuple, random_walks(_edges_df(spark), starts, steps=6).collect()))
    r2 = sorted(map(tuple, random_walks(_edges_df(spark), starts, steps=6).collect()))
    assert r1 == r2
    # a different seed takes a different path eventually
    r3 = sorted(
        map(
            tuple,
            random_walks(
                _edges_df(spark), starts, steps=6, seed="other"
            ).collect(),
        )
    )
    assert r1 != r3


def test_ranked_edges_dense_ranks_and_degree(spark):
    re_df = ranked_edges(_edges_df(spark)).collect()
    by_src = {}
    for r in re_df:
        by_src.setdefault(r["src"], []).append((r["rnk"], r["dst"], r["deg"]))
    for s, rows in by_src.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert all(r[2] == len(rows) for r in rows)
    assert by_src["a"] == [(1, "b", 2), (2, "c", 2)]


def test_max_degree_caps_adjacency_deterministically(spark):
    hub = [("h", f"n{i}") for i in range(20)] + [("x", "y")]
    capped = ranked_edges(_edges_df(spark, hub), max_degree=5)
    rows = capped.filter("src = 'h'").collect()
    assert len(rows) == 5
    assert all(r["deg"] == 5 for r in rows)
    again = ranked_edges(_edges_df(spark, hub), max_degree=5)
    assert sorted(r["dst"] for r in rows) == sorted(
        r["dst"] for r in again.filter("src = 'h'").collect()
    )


def test_skipgram_pairs_hand_checkable(spark):
    # one synthetic walk a,b,c,d (steps 0..3), window=2
    walks = spark.createDataFrame(
        [Row(walk_id="w", step=i, node=n) for i, n in enumerate("abcd")]
    )
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    expect = {}
    seq = "abcd"
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                k = (seq[i], seq[j])
                expect[k] = expect.get(k, 0) + 1
    assert got == expect


def test_skipgram_pairs_counts_repeat_nodes(spark):
    # node revisits aggregate: walk a,b,a gives (a,b) twice
    walks = spark.createDataFrame(
        [Row(walk_id="w", step=i, node=n) for i, n in enumerate("aba")]
    )
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got[("a", "b")] == 2 and got[("b", "a")] == 2
    assert got[("a", "a")] == 2  # steps 0↔2 within window


def test_walk_row_counts_bounded_by_walks_not_degree(spark):
    # 1 walk through a 50-neighbor hub emits exactly 1 row per step —
    # the rank-join must not multiply by adjacency
    edges = [("h", f"n{i}") for i in range(50)] + [
        (f"n{i}", "h") for i in range(50)
    ]
    starts = spark.createDataFrame([Row(id="h")])
    out = random_walks(_edges_df(spark, edges), starts, steps=7)
    per_step = {
        r["step"]: r["c"]
        for r in out.groupBy("step").count().withColumnRenamed("count", "c").collect()
    }
    assert per_step == {t: 1 for t in range(8)}
