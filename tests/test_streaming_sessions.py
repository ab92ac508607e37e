"""Event-time session windows (streaming/sessions.py): batch mode
matches a pure-Python gap-merge twin, and the stream emits exactly the
watermark-closed sessions the batch computation produces."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
    TimestampType,
    StringType,
)

from kg_microbe_merge_spark.streaming.sessions import (
    run_session_stream,
    session_aggregate,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)
T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(user, minutes, value=1.0):
    return (user, T0 + timedelta(minutes=minutes), value)


EVENTS = [
    # u1: two sessions — 0,10,25 (gaps 10,15 < 30) then 70,75
    _ev("u1", 0, 2.0), _ev("u1", 10, 3.0), _ev("u1", 25, 1.0),
    _ev("u1", 70, 5.0), _ev("u1", 75, 1.5),
    # u2: one long chained session 5,30,55
    _ev("u2", 5, 1.0), _ev("u2", 30, 1.0), _ev("u2", 55, 1.0),
    # u3: single event
    _ev("u3", 40, 9.0),
]


def py_sessions(events, gap_min=30):
    out = []
    by_user: dict[str, list] = {}
    for u, ts, v in events:
        by_user.setdefault(u, []).append((ts, v))
    for u, evs in by_user.items():
        evs.sort()
        cur = [evs[0]]
        for ts, v in evs[1:]:
            if (ts - cur[-1][0]).total_seconds() < gap_min * 60:
                cur.append((ts, v))
            else:
                out.append((u, cur))
                cur = [(ts, v)]
        out.append((u, cur))
    return sorted(
        (
            u,
            evs[0][0],
            evs[-1][0] + timedelta(minutes=gap_min),
            len(evs),
            sum(v for _, v in evs),
        )
        for u, evs in out
    )


def _rows(df):
    return sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in df.collect()
    )


def test_batch_matches_python_twin(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    got = _rows(session_aggregate(df, gap="30 minutes"))
    assert got == py_sessions(EVENTS)
    # structure sanity: u1 has 2 sessions, u2 chained into 1
    per_user = {}
    for u, *_ in got:
        per_user[u] = per_user.get(u, 0) + 1
    assert per_user == {"u1": 2, "u2": 1, "u3": 1}


def test_stream_emits_watermark_closed_sessions(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(EVENTS, SCHEMA).write.parquet(
        events_dir + "/batch1"
    )
    # flush event far in the future: pushes the watermark past every
    # real session's close so they all emit (the standard drain trick)
    flush = [("flush", T0 + timedelta(days=2), 0.0)]
    spark.createDataFrame(flush, SCHEMA).write.parquet(
        events_dir + "/batch2"
    )

    q = run_session_stream(
        spark,
        events_dir + "/*",
        out_dir,
        ckpt,
        SCHEMA,
        gap="30 minutes",
        watermark="10 minutes",
    )
    q.awaitTermination(120)
    # one drain processes all files in ONE micro-batch, where the
    # watermark only advances AFTER the batch; run a second drain so
    # the state store evicts+emits against the advanced watermark
    q2 = run_session_stream(
        spark, events_dir + "/*", out_dir, ckpt, SCHEMA,
        gap="30 minutes", watermark="10 minutes",
    )
    q2.awaitTermination(120)

    got = [r for r in _rows(spark.read.parquet(out_dir)) if r[0] != "flush"]
    assert got == py_sessions(EVENTS)
