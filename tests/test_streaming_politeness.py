"""Stateful per-host politeness rate limiting
(streaming/politeness.py): per-wave budget, priority order, backlog
drain via re-armed timeouts, overflow accounting, checkpoint resume.

With ProcessingTimeTimeout configured, Spark schedules micro-batches
continually (availableNow never terminates), so each drain runs a
short processing-time trigger, polls the COMMITTED output (parquet
sink _spark_metadata) until the expected row count, then stops. The
assertions are on politeness WAVES — at most per_batch rows per
(host, wave) — not on a one-batch-per-call shape.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.streaming.politeness import (
    rate_limited_fetch_stream,
)

SCHEMA = "url string, priority long"


def _write_batch(spark, src_dir, rows, mode, mtime=None):
    before = (
        set(os.listdir(src_dir)) if os.path.isdir(src_dir) else set()
    )
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        mode
    ).parquet(src_dir)
    if mtime is not None:
        # pin source-file order: FileStreamSource processes oldest
        # first. Touch ONLY the files this write created — re-touching
        # pre-existing files would erase their earlier (older) stamp.
        fresh = set(os.listdir(src_dir)) - (
            before if mode == "append" else set()
        )
        for name in fresh:
            if name.endswith(".parquet"):
                path = os.path.join(src_dir, name)
                os.utime(path, (mtime, mtime))


def _drain(
    spark,
    src_dir,
    out_dir,
    ckpt,
    expected_rows,
    per_batch=2,
    max_backlog=100,
    max_files=1000,
):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", str(max_files)
    ).parquet(src_dir)
    q = (
        rate_limited_fetch_stream(
            stream, per_batch=per_batch, max_backlog=max_backlog
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= expected_rows:
                    break
            except Exception:
                pass  # sink not committed yet
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    got = spark.read.parquet(out_dir)
    assert got.count() == expected_rows
    return got


def _rows(host, n, prio0=0):
    return [(f"https://{host}/p{i}", prio0 + i) for i in range(n)]


def _assert_polite(df, per_batch):
    over = (
        df.groupBy("host", "wave")
        .count()
        .filter(F.col("count") > per_batch)
        .count()
    )
    assert over == 0
    assert df.filter(F.col("slot") >= per_batch).count() == 0


def test_waves_budget_and_priority(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_batch(
        spark,
        src,
        _rows("a.com", 5)
        + _rows("b.org", 1, 100)
        + [("https://b.org/nullprio", None)],  # NULL priority -> 0
        "overwrite",
    )
    res = _drain(spark, src, out, ckpt, expected_rows=7)
    got = {
        r["url"]: (r["wave"], r["slot"], r["backlog_after"])
        for r in res.collect()
    }
    # host a drains 5 urls in 3 waves of <=2, priority DESC
    assert got["https://a.com/p4"] == (0, 0, 3)
    assert got["https://a.com/p3"] == (0, 1, 3)
    assert got["https://a.com/p2"] == (1, 0, 1)
    assert got["https://a.com/p1"] == (1, 1, 1)
    assert got["https://a.com/p0"] == (2, 0, 0)
    assert got["https://b.org/p0"] == (0, 0, 0)
    assert got["https://b.org/nullprio"] == (0, 1, 0)
    _assert_polite(res, per_batch=2)


def test_new_arrival_outranks_backlog(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    now = time.time()
    # file 1 (older): 5 candidates; file 2 (newer): one hot url.
    # maxFilesPerTrigger=1 => the hot url arrives in micro-batch 2 and
    # merges with the backlog carried from micro-batch 1.
    _write_batch(spark, src, _rows("a.com", 5), "overwrite", mtime=now - 60)
    _write_batch(
        spark, src, [("https://a.com/hot", 99)], "append", mtime=now
    )
    res = _drain(spark, src, out, ckpt, expected_rows=6, max_files=1)
    got = {
        r["url"]: (r["wave"], r["slot"]) for r in res.collect()
    }
    assert got["https://a.com/p4"] == (0, 0)
    assert got["https://a.com/p3"] == (0, 1)
    # the late hot url beats every backlogged candidate
    assert got["https://a.com/hot"] == (1, 0)
    assert got["https://a.com/p2"] == (1, 1)
    assert got["https://a.com/p1"] == (2, 0)
    assert got["https://a.com/p0"] == (2, 1)
    _assert_polite(res, per_batch=2)


def test_overflow_drops_are_counted(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_batch(spark, src, _rows("h.com", 8), "overwrite")
    res = _drain(
        spark, src, out, ckpt, expected_rows=5, per_batch=2, max_backlog=3
    )
    got = res.collect()
    # 8 in: 2 emitted + 3 kept + 3 dropped at wave 0; the kept 3 drain
    # in waves 1-2; the 3 lowest-priority urls are gone but COUNTED
    assert {r["url"] for r in got} == {
        f"https://h.com/p{i}" for i in range(3, 8)
    }
    assert {r["dropped_so_far"] for r in got} == {3}
    assert {r["backlog_after"] for r in got if r["wave"] == 0} == {3}
    assert {r["backlog_after"] for r in got if r["wave"] == 2} == {0}


def test_checkpoint_resume_and_rediscovery(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_batch(
        spark,
        src,
        [("https://h.com/x", 1), ("https://h.com/x", 7),
         ("https://h.com/y", 5), ("https://h.com/z", 6)],
        "overwrite",
    )
    out1 = _drain(spark, src, out, ckpt, expected_rows=3)
    got1 = {
        r["url"]: (r["priority"], r["wave"], r["slot"])
        for r in out1.collect()
    }
    # x deduped at its best priority (7); z then y follow
    assert got1 == {
        "https://h.com/x": (7, 0, 0),
        "https://h.com/z": (6, 0, 1),
        "https://h.com/y": (5, 1, 0),
    }
    # restart from the checkpoint: wave counter resumes (2, not 0);
    # a rediscovered url is scheduled again (recrawl semantics)
    _write_batch(
        spark,
        src,
        [("https://h.com/w", 9), ("https://h.com/y", 2)],
        "append",
    )
    out2 = _drain(spark, src, out, ckpt, expected_rows=5)
    got2 = {
        r["url"]: (r["wave"], r["slot"])
        for r in out2.filter(F.col("wave") >= 2).collect()
    }
    assert got2 == {
        "https://h.com/w": (2, 0),
        "https://h.com/y": (2, 1),
    }


def test_param_validation(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        rate_limited_fetch_stream(df, per_batch=0)
    with pytest.raises(ValueError):
        rate_limited_fetch_stream(df, max_backlog=-1)
    with pytest.raises(ValueError):
        rate_limited_fetch_stream(df, drain_delay_ms=0)
