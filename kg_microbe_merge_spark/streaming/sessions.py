"""Event-time session windows — the stateful-streaming face of
``functions/sessions.py``.

Batch ``sessionize`` numbers sessions with window functions over a
static table; a continuously-arriving event stream needs the native
``session_window`` aggregation instead: Spark's state store merges
events into open sessions per key, the event-time watermark bounds how
long a session can stay open (late data past the watermark is
dropped), and a session is EMITTED exactly once — when the watermark
passes its close (last event + gap). That is the standard
user-activity rollup a crawl/telemetry pipeline runs continuously.

One definition, two execution modes (the module convention,
streaming/ingest.py): :func:`session_aggregate` works identically on a
batch DataFrame (no watermark, all sessions emitted) and a streaming
one — the tested invariant is *stream ≡ batch* for every session the
watermark has closed.

Scale: the shuffle is one hash exchange on the session key; state per
key is one open-session struct per active session (merged in place by
the state store), so state size tracks ACTIVE users, not history —
the file sink's exactly-once log handles replay. Gap-merge semantics:
two events belong to one session iff their times are within ``gap``;
``session_window`` merges overlapping [ts, ts+gap) intervals, i.e. a
gap strictly smaller than ``gap`` chains a session (an event exactly
``gap`` after the previous starts a new one)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """(user, session_start, session_end, n_events, total_value) — one
    row per gap-merged session. On a streaming frame the watermark is
    applied first (required for append-mode session state eviction);
    on a batch frame it is skipped and every session emits."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("total_value"),
        )
        .select(
            user_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_session_stream(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Launch the event stream → closed-session parquet feed (append
    mode: each session row is written exactly once, after the watermark
    passes its close)."""
    events = spark.readStream.schema(schema).parquet(events_dir)
    sessions = session_aggregate(
        events, gap=gap, watermark=watermark
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
