"""As-of join semantics: backward inclusive, per-key isolation, NULL
when no prior right row, multiple value columns."""

from __future__ import annotations

import datetime as dt

from kg_microbe_merge_spark.operators.asof import asof_join

T = lambda m: dt.datetime(2024, 1, 1, 0, m, 0)  # noqa: E731


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, T(10)), (2, 1, T(20)), (3, 1, T(5)), (4, 2, T(30))],
        "eid long, u long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(10), 100.0), (1, T(15), 150.0), (2, T(40), 400.0)],
        "u long, ts timestamp, v double",
    )
    out = {
        r["eid"]: r["v"]
        for r in asof_join(
            left, right, on=["u"], left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out[1] == 100.0     # inclusive: right at the same instant counts
    assert out[2] == 150.0     # most recent prior
    assert out[3] is None      # nothing at or before T5
    assert out[4] is None      # right row for u=2 is in the future


def test_asof_multiple_value_cols_and_schema(spark):
    left = spark.createDataFrame([(1, 1, T(20))], "eid long, u long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(10), 1.5, "a"), (1, T(15), 2.5, "b")],
        "u long, ts timestamp, v double, tag string",
    )
    rows = asof_join(
        left, right, on=["u"], left_ts="ts", right_ts="ts",
        value_cols=["v", "tag"], suffix="_r",
    ).collect()
    assert rows[0]["v_r"] == 2.5 and rows[0]["tag_r"] == "b"
    assert set(rows[0].asDict()) == {"eid", "u", "ts", "v_r", "tag_r"}
