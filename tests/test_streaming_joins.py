"""Stream-stream join (streaming/joins.py): streaming result equals the
batch join for matured pairs; the range condition excludes out-of-skew
anchors; late anchors past the watermark are dropped."""

from __future__ import annotations

import datetime as dt
import os

from kg_microbe_merge_spark.streaming.joins import pages_with_anchors

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mk(spark, tmp_path):
    pages = [
        ("u1", T0),
        ("u2", T0 + dt.timedelta(minutes=5)),
        ("u3", T0 + dt.timedelta(minutes=10)),
    ]
    anchors = [
        # matches u1 (within 30 min)
        ("u1", T0 + dt.timedelta(minutes=10), "see u1", "src_a"),
        # out of skew for u1 (+45 min) -> excluded by range condition
        ("u1", T0 + dt.timedelta(minutes=45), "stale u1", "src_b"),
        # matches u2 (skew -20 min)
        ("u2", T0 - dt.timedelta(minutes=15), "early u2", "src_c"),
        # no such page
        ("u9", T0, "dangling", "src_d"),
    ]
    p_dir, a_dir = str(tmp_path / "pages"), str(tmp_path / "anchors")
    spark.createDataFrame(
        pages, "url string, warc_ts timestamp"
    ).write.parquet(p_dir)
    spark.createDataFrame(
        anchors,
        "dst_url string, seen_ts timestamp, anchor_text string, "
        "src_url string",
    ).write.parquet(a_dir)
    return p_dir, a_dir


def _collect(df):
    return sorted(
        (r["url"], r["anchor_text"], r["src_url"]) for r in df.collect()
    )


def test_stream_equals_batch(spark, tmp_path):
    p_dir, a_dir = _mk(spark, tmp_path)
    batch = pages_with_anchors(
        spark.read.parquet(p_dir), spark.read.parquet(a_dir)
    )
    expected = _collect(batch)
    assert expected == [
        ("u1", "see u1", "src_a"),
        ("u2", "early u2", "src_c"),
    ]

    p_stream = spark.readStream.schema(
        "url string, warc_ts timestamp"
    ).parquet(p_dir)
    a_stream = spark.readStream.schema(
        "dst_url string, seen_ts timestamp, anchor_text string, "
        "src_url string"
    ).parquet(a_dir)
    out = str(tmp_path / "out")
    q = (
        pages_with_anchors(p_stream, a_stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _collect(
        spark.read.parquet(out).select("url", "anchor_text", "src_url")
    )
    assert got == expected
