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


# --- node2vec biased walks ------------------------------------------


def test_node2vec_matches_python_twin(spark):
    import random as _r

    from kg_microbe_merge_spark.operators.walks import (
        node2vec_walks,
        node2vec_walks_py,
    )

    rng = _r.Random(13)
    edges = sorted({(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                    for _ in range(90)})
    edges = [e for e in edges if e[0] != e[1]]
    starts = [f"n{i}" for i in range(25)]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in starts], "id string")
    got = {(r["walk_id"], r["step"], r["node"])
           for r in node2vec_walks(e, s, steps=4).collect()}
    want = set(node2vec_walks_py(edges, starts, steps=4))
    assert got == want and got


def test_node2vec_matches_duckdb_twin(spark):
    import random as _r

    import duckdb

    from kg_microbe_merge_spark.operators.walks import (
        node2vec_walks,
        node2vec_walks_sql,
    )

    rng = _r.Random(5)
    edges = sorted({(f"n{rng.randrange(15)}", f"n{rng.randrange(15)}")
                    for _ in range(50)})
    edges = [e for e in edges if e[0] != e[1]]
    starts = [f"n{i}" for i in range(15)]
    evals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    svals = ", ".join(f"('{x}')" for x in starts)
    sql = node2vec_walks_sql(
        f"SELECT a AS src, b AS dst FROM (VALUES {evals}) t(a, b)",
        f"SELECT x AS id FROM (VALUES {svals}) s(x)",
        steps=3,
    )
    want = set(map(tuple, duckdb.sql(sql).fetchall()))
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in starts], "id string")
    got = {(r["walk_id"], r["step"], r["node"])
           for r in node2vec_walks(e, s, steps=3).collect()}
    assert got == want and got


def test_node2vec_first_step_uniform_equals_deepwalk_shape(spark):
    # prev is NULL on step 1 → weight w_max → always accepted in round
    # 1, i.e. candidate = uniform draw with the round-1 salt
    from kg_microbe_merge_spark.operators.walks import (
        node2vec_walks,
        node2vec_walks_py,
    )

    edges = [("a", "b"), ("a", "c"), ("a", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([("a",)], "id string")
    got = sorted(
        (r["step"], r["node"])
        for r in node2vec_walks(e, s, steps=1).collect()
    )
    want = sorted((st, n) for _, st, n in
                  node2vec_walks_py(edges, ["a"], steps=1))
    assert got == want
    assert len(got) == 2  # start + one uniform step


def test_node2vec_bias_prefers_near_over_far(spark):
    # controlled second-order transition: walks funnel w_j -> a -> b;
    # from b with prev=a the candidates are exactly a (return),
    # c (near: (a,c) is an edge) and d (far). With w_near dominant and
    # enough rejection rounds nearly every walk picks c; the uniform
    # parameterization picks c ~1/3 of the time.
    from kg_microbe_merge_spark.operators.walks import node2vec_walks_py

    base = [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("b", "d")]
    starts = [f"w{j}" for j in range(120)]
    edges = base + [(s, "a") for s in starts]

    def c_frac(rows):
        by_walk = {}
        for w, st, n in rows:
            by_walk.setdefault(w, {})[st] = n
        picked = [wk[3] for wk in by_walk.values()
                  if wk.get(2) == "b" and 3 in wk]
        assert picked
        return sum(n == "c" for n in picked) / len(picked)

    biased_rows = node2vec_walks_py(
        edges, starts, steps=3, w_return=1_000, w_near=1_000_000,
        w_far=1_000, rounds=8)
    uniform_rows = node2vec_walks_py(
        edges, starts, steps=3, w_return=1_000_000,
        w_near=1_000_000, w_far=1_000_000, rounds=1)
    assert c_frac(biased_rows) > 0.85
    assert c_frac(uniform_rows) < 0.6


def test_node2vec_guards(spark):
    from kg_microbe_merge_spark.operators.walks import node2vec_walks

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "id string")
    import pytest as _pt
    with _pt.raises(ValueError, match="positive"):
        node2vec_walks(e, s, w_far=0)
    with _pt.raises(ValueError, match="rounds"):
        node2vec_walks(e, s, rounds=0)
