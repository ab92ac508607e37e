"""Table profiler (operators/profile.py): hand-checked stats incl.
NULL handling and native-type min/max, param guards, DuckDB twin, and
the one-aggregation plan shape (single exchange)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.profile import (
    profile_sql,
    profile_table,
)

ROWS = [
    Row(id=1, name="b", qty=None),
    Row(id=2, name="a", qty=10),
    Row(id=3, name="a", qty=9),
    Row(id=4, name=None, qty=100),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, name string, qty long")


def _got(df):
    return {
        r["column"]: (
            r["n_rows"], r["n_nulls"], r["n_distinct"],
            r["min_value"], r["max_value"],
        )
        for r in df.collect()
    }


def test_hand_values(spark):
    got = _got(profile_table(_df(spark)))
    assert got == {
        "id": (4, 0, 4, "1", "4"),
        "name": (4, 1, 2, "a", "b"),
        # native-type min/max: 9 < 10 < 100 numerically, NULL excluded
        "qty": (4, 1, 3, "9", "100"),
    }
    sub = _got(profile_table(_df(spark), columns=["name"]))
    assert list(sub) == ["name"]


def test_guards(spark):
    with pytest.raises(ValueError):
        profile_table(_df(spark), columns=[])
    with pytest.raises(ValueError):
        profile_table(_df(spark), columns=["nope"])


def test_vs_duckdb(spark):
    got = sorted(map(tuple, profile_table(_df(spark)).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, name VARCHAR, qty BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(r.id, r.name, r.qty) for r in ROWS],
    )
    oracle = sorted(
        map(tuple, con.execute(
            profile_sql("t", ["id", "name", "qty"])
        ).fetchall())
    )
    assert got == oracle


def test_single_exchange_plan(spark):
    plan = (
        profile_table(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the Expand-based distinct aggregation shuffles once on the
    # (column-id, value) keys, then ONE SinglePartition gather of the
    # per-key partials into the 1-row global profile — nothing else
    assert plan.count("Exchange") == 2
    assert plan.count("Exchange SinglePartition") == 1
    assert "Expand" in plan
