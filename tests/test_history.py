"""SCD2 validity-interval history (operators/history.py)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.history import (
    scd2_apply,
    scd2_asof,
    scd2_from_log,
    scd2_init,
)

KEY, TRACKED = "id", ["name", "cat"]


def _delta(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, cat=c) for i, n, c in rows],
        schema="id bigint, name string, cat string",
    )


def _hist_set(df):
    return {
        (r["id"], r["name"], r["cat"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    }


def test_fold_semantics_handcrafted(spark):
    h = scd2_init(_delta(spark, [(1, "a", "x"), (2, "b", "y")]), KEY, TRACKED, 0)
    # batch 1: key 1 changes cat, key 2 unchanged, key 3 new, key 2
    # stays current even though... (2 IS in the delta, unchanged)
    h = scd2_apply(
        h,
        _delta(spark, [(1, "a", "z"), (2, "b", "y"), (3, "c", "w")]),
        KEY,
        TRACKED,
        1,
    )
    assert _hist_set(h) == {
        (1, "a", "x", 0, 1),
        (1, "a", "z", 1, None),
        (2, "b", "y", 0, None),
        (3, "c", "w", 1, None),
    }
    # batch 2: key 2 absent (stays current), key 1 unchanged, key 3
    # changes name
    h = scd2_apply(
        h, _delta(spark, [(1, "a", "z"), (3, "d", "w")]), KEY, TRACKED, 2
    )
    assert _hist_set(h) == {
        (1, "a", "x", 0, 1),
        (1, "a", "z", 1, None),
        (2, "b", "y", 0, None),
        (3, "c", "w", 1, 2),
        (3, "d", "w", 2, None),
    }


def test_null_safe_change_detection(spark):
    h = scd2_init(_delta(spark, [(1, None, "x")]), KEY, TRACKED, 0)
    # NULL -> NULL is NOT a change; NULL -> value is
    h = scd2_apply(h, _delta(spark, [(1, None, "x")]), KEY, TRACKED, 1)
    assert _hist_set(h) == {(1, None, "x", 0, None)}
    h = scd2_apply(h, _delta(spark, [(1, "v", "x")]), KEY, TRACKED, 2)
    assert _hist_set(h) == {(1, None, "x", 0, 2), (1, "v", "x", 2, None)}


def test_chained_folds_equal_log_derivation(spark):
    """The invariant (and the gate oracle): folding deltas one-by-one
    reproduces the one-pass window derivation over the change log."""
    rng = random.Random(5)
    names = ["a", "b", "c"]
    cats = ["x", "y", None]
    log_rows = []
    h = None
    for b in range(6):
        batch = []
        for key in range(12):
            if rng.random() < 0.55:
                batch.append(
                    (key, rng.choice(names), rng.choice(cats))
                )
        if not batch:
            continue
        d = _delta(spark, batch)
        h = (
            scd2_init(d, KEY, TRACKED, b)
            if h is None
            else scd2_apply(h, d, KEY, TRACKED, b)
        )
        h = h.localCheckpoint(eager=True)
        log_rows += [(b, *r) for r in batch]
    log = spark.createDataFrame(
        [Row(batch_id=b, id=i, name=n, cat=c) for b, i, n, c in log_rows]
    )
    derived = scd2_from_log(log, KEY, TRACKED)
    assert _hist_set(h) == _hist_set(derived)


def test_asof_snapshots(spark):
    h = scd2_init(_delta(spark, [(1, "a", "x")]), KEY, TRACKED, 0)
    h = scd2_apply(h, _delta(spark, [(1, "a", "y")]), KEY, TRACKED, 1)
    h = scd2_apply(
        h, _delta(spark, [(1, "a", "z"), (2, "b", "w")]), KEY, TRACKED, 2
    )
    at = lambda b: {
        (r["id"], r["name"], r["cat"]) for r in scd2_asof(h, b).collect()
    }
    assert at(0) == {(1, "a", "x")}
    assert at(1) == {(1, "a", "y")}
    assert at(2) == {(1, "a", "z"), (2, "b", "w")}
    assert at(99) == at(2)


def test_history_never_shuffle_joined(spark):
    """The fold's joins against history are all broadcast (the upsert
    discipline): no SortMergeJoin / ShuffledHashJoin anywhere in the
    plan, so history-side cost is one scan regardless of size."""
    h = scd2_init(_delta(spark, [(i, "a", "x") for i in range(50)]),
                  KEY, TRACKED, 0)
    out = scd2_apply(
        h, _delta(spark, [(1, "a", "y")]), KEY, TRACKED, 1
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
