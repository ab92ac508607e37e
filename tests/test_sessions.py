"""Sessionization semantics: gap splitting, per-user isolation,
tiebreak determinism."""

from __future__ import annotations

import datetime as dt

from kg_microbe_merge_spark.functions.sessions import (
    rolling_user_stats,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = [
        # user 1: two sessions separated by a 45-min gap
        (1, 1, T0, 10.0),
        (2, 1, T0 + dt.timedelta(minutes=10), 20.0),
        (3, 1, T0 + dt.timedelta(minutes=55), 30.0),
        # user 2: one session, events 29 min apart (inside the gap)
        (4, 2, T0, 5.0),
        (5, 2, T0 + dt.timedelta(minutes=29), 5.0),
        (6, 2, T0 + dt.timedelta(minutes=58), 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_sessionize_gap_split(spark):
    out = sessionize(_events(spark), gap_minutes=30, tiebreak_cols=["event_id"])
    seq = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert seq[1] == 1 and seq[2] == 1          # same session
    assert seq[3] == 2                           # 45-min gap -> new session
    assert seq[4] == seq[5] == seq[6] == 1       # chained 29-min gaps


def test_session_stats(spark):
    out = session_stats(_events(spark), gap_minutes=30)
    stats = {(r["user_id"], r["session_seq"]): r for r in out.collect()}
    s11 = stats[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["sum_value"] == 30.0
    assert s11["duration_sec"] == 600
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(2, 1)]["duration_sec"] == 58 * 60


def test_rolling_stats(spark):
    out = rolling_user_stats(_events(spark))
    u1 = sorted(
        (r["event_idx"], r["running_value"])
        for r in out.filter("user_id = 1").collect()
    )
    assert u1 == [(1, 10.0), (2, 30.0), (3, 60.0)]
