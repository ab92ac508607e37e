"""Event sessionization + rolling window analytics.

Beyond the reference (strictly batch KG merge), these are the standard
event-stream operators a training-data/analytics pipeline needs; both
are pure window-function plans with exact ANSI-SQL twins (driver
oracle-checked).

- :func:`sessionize` — classic gap-based sessions: a new session starts
  when the gap to the previous event of the same user exceeds
  ``gap_minutes``; session id = cumulative sum of session-start flags
  per user. Two stacked windows over ONE partitioning (user_id, ts) —
  a single shuffle+sort serves both.
- :func:`rolling_user_stats` — per-user running aggregates (event index,
  running value sum) over the same ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(col: Column) -> Column:
    """Timestamp → whole epoch seconds. TIMESTAMP_NTZ cannot cast to
    BIGINT under ANSI; hop through timestamp_ltz (session TZ is pinned
    to UTC in session.py, so NTZ≡UTC instant)."""
    return col.cast("timestamp_ltz").cast("long")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per-user session index) and
    ``is_session_start`` to each event row.

    ``tiebreak_cols`` pins the within-partition order under timestamp
    ties — required for deterministic results on a distributed engine.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_sec = _epoch_sec(F.col(ts_col)) - _epoch_sec(prev_ts)
    is_start = F.when(
        prev_ts.isNull() | (gap_sec > gap_minutes * 60), 1
    ).otherwise(0)
    out = events.withColumn("is_session_start", is_start)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return out.withColumn("session_seq", F.sum("is_session_start").over(cum))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): event count, exact value sum
    (integer-cents), duration in seconds."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col(value_col) * 100).cast("long")) / F.lit(100.0)).alias(
                "sum_value"
            ),
            (
                _epoch_sec(F.max(F.col(ts_col)))
                - _epoch_sec(F.min(F.col(ts_col)))
            ).alias("duration_sec"),
        )
    )


def rolling_user_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running event index and running value sum (integer-cents
    exact), ordered by time."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        user_col,
        ts_col,
        F.row_number().over(w).alias("event_idx"),
        (F.sum(F.round(F.col(value_col) * 100).cast("long")).over(cum) / F.lit(100.0)).alias(
            "running_value"
        ),
    )
