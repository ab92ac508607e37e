"""Incremental snapshot upsert: fold(delta into merged snapshot) must be
value-identical to re-merging the full raw union (the reference's A3
full-table group-merge, utils/duckdb_utils.py:319-342), and must never
shuffle the snapshot side."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.merge import nodes_merge
from kg_microbe_merge_spark.operators.upsert import (
    NAME_STATE_COLUMN,
    nodes_merge_incremental,
    nodes_merge_with_state,
)

COLS = ["id", "category", "name", "xref", "provided_by", "synonym"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _collect(df):
    return sorted(
        tuple(r) for r in df.drop(NAME_STATE_COLUMN).collect()
    ) if NAME_STATE_COLUMN in df.columns else sorted(tuple(r) for r in df.collect())


def test_incremental_equals_full_merge_handcrafted(spark):
    # covers: priority name in old only / new only / both / neither,
    # NULL names, brand-new id, untouched id, pipe-set union
    old = [
        ("n1", "c1", "alpha", "x1", "R", "s1"),     # prio name in OLD
        ("n1", "c2", "zeta", "x2", "Q", "s2"),
        ("n2", "c1", "mid", "x3", "Q", None),       # no prio yet
        ("n3", None, None, None, "Q", "s3"),        # all-null name group
        ("n4", "c4", "keep", "x4", "R", "s4"),      # untouched by delta
    ]
    new = [
        ("n1", "c3", "beta", "x1", "Q", "s9"),      # non-prio add to prio group
        ("n2", "c2", "win", "x3", "R", "s5"),       # prio name arrives in NEW
        ("n3", "c9", "late", "x9", "Q", None),      # fallback-name update
        ("n5", "c5", "fresh", "x5", "Q", "s6"),     # brand-new id
    ]
    full = nodes_merge(_df(spark, old + new), ["R"])
    snap = nodes_merge_with_state(_df(spark, old), ["R"], sort_output=False)
    inc = nodes_merge_incremental(snap, _df(spark, new), ["R"])
    assert _collect(inc) == _collect(full)
    # sidecar correctness: n2 flips to priority, n3/n5 stay fallback
    flags = {r["id"]: r[NAME_STATE_COLUMN] for r in inc.collect()}
    assert flags == {"n1": True, "n2": True, "n3": False, "n4": True, "n5": False}


def test_incremental_chain_equals_full_merge_random(spark):
    rng = random.Random(7)
    ids = [f"n{i}" for i in range(40)]
    names = [None, "a", "b", "m", "z"]
    srcs = ["R", "Q", "S"]

    def row():
        return (
            rng.choice(ids),
            rng.choice(["c1", "c2", None]),
            rng.choice(names),
            rng.choice(["x1", "x2", "x3", None]),
            rng.choice(srcs),
            rng.choice(["s1", "s2", None]),
        )

    batches = [[row() for _ in range(60)] for _ in range(3)]
    full = nodes_merge(_df(spark, [r for b in batches for r in b]), ["R"])
    snap = nodes_merge_with_state(_df(spark, batches[0]), ["R"], sort_output=False)
    for b in batches[1:]:  # two successive deltas — snapshots must chain
        snap = nodes_merge_incremental(snap, _df(spark, b), ["R"], sort_output=False)
    assert _collect(snap) == _collect(full)


def test_incremental_with_schema_drift(spark):
    # KGX sources have differing headers: the delta lacks snapshot
    # columns AND introduces a new one — fold must equal a full merge
    # over the union-aligned raw rows (NULL-padded both directions)
    old = spark.createDataFrame(
        [("n1", "c1", "alpha", "R"), ("n2", "c2", "beta", "Q")],
        ["id", "category", "name", "provided_by"],
    )
    new = spark.createDataFrame(
        [("n1", "zeta", "Q", "syn1"), ("n3", "gamma", "R", "syn2")],
        ["id", "name", "provided_by", "synonym"],
    )
    full = nodes_merge(
        old.unionByName(new, allowMissingColumns=True), ["R"]
    )
    snap = nodes_merge_with_state(old, ["R"], sort_output=False)
    inc = nodes_merge_incremental(snap, new, ["R"])
    got = sorted(tuple(r) for r in inc.drop(NAME_STATE_COLUMN).select(*full.columns).collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_snapshot_side_never_shuffled(spark, tmp_path):
    # realistic shape: snapshot read from parquet, small delta folded in.
    # Every join against the snapshot must be a broadcast join — the
    # only Exchange allowed is the delta's own aggregation shuffle.
    snap_raw = _df(
        spark, [(f"n{i}", "c", f"name{i}", "x", "Q", "s") for i in range(200)]
    )
    nodes_merge_with_state(snap_raw, ["R"], sort_output=False).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "snap"))
    snap = spark.read.parquet(str(tmp_path / "snap"))
    delta = _df(spark, [("n1", "c9", "zz", "x9", "R", "s9")])
    out = nodes_merge_incremental(snap, delta, ["R"], sort_output=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # anti + semi/outer on snapshot
    assert _collect(out) == _collect(
        nodes_merge(snap_raw.unionByName(delta), ["R"])
    )


# --- incremental EDGE upsert -------------------------------------------

ECOLS = ["subject", "predicate", "object", "relation", "knowledge_source"]


def _edf(spark, rows):
    return spark.createDataFrame(rows, ECOLS)


def _erows(n, tag, start=0):
    return [
        (
            f"P:{(start + i) % 7}",
            "related_to" if i % 2 else "part_of",
            f"S:{(start + i) % 5}",
            f"rel_{tag}{i % 3}",
            f"src_{tag}",
        )
        for i in range(n)
    ]


def test_edges_incremental_equals_full_merge(spark):
    from kg_microbe_merge_spark.operators.merge import edges_merge_provenance
    from kg_microbe_merge_spark.operators.upsert import edges_merge_incremental

    old, new = _erows(40, "a"), _erows(25, "b", start=3)
    snap = edges_merge_provenance(_edf(spark, old), sort_output=False)
    got = edges_merge_incremental(snap, _edf(spark, new))
    want = edges_merge_provenance(_edf(spark, old + new))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # chained second delta keeps the invariant
    third = _erows(10, "c", start=6)
    got2 = edges_merge_incremental(got, _edf(spark, third))
    want2 = edges_merge_provenance(_edf(spark, old + new + third))
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))


def test_edges_incremental_distinct_variant(spark):
    from kg_microbe_merge_spark.operators.merge import edges_merge
    from kg_microbe_merge_spark.operators.upsert import edges_merge_incremental

    old = _edf(spark, _erows(30, "a")).select("subject", "predicate", "object")
    new = _edf(spark, _erows(20, "b", start=2)).select(
        "subject", "predicate", "object"
    )
    snap = edges_merge(old, sort_output=False)
    got = edges_merge_incremental(snap, new)
    want = edges_merge(old.unionByName(new))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_edges_incremental_snapshot_never_shuffled(spark, tmp_path):
    from kg_microbe_merge_spark.operators.merge import edges_merge_provenance
    from kg_microbe_merge_spark.operators.upsert import edges_merge_incremental

    snap_path = str(tmp_path / "esnap")
    edges_merge_provenance(
        _edf(spark, _erows(60, "a")), sort_output=False
    ).write.parquet(snap_path)
    snap = spark.read.parquet(snap_path)
    out = edges_merge_incremental(
        snap, _edf(spark, _erows(8, "b")), sort_output=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    # the only exchange keys allowed are the delta aggregation's —
    # nothing repartitions the snapshot scan
    assert "BroadcastHashJoin" in plan, plan
