"""Stateful streaming URL dedup: within-batch dedup, and state survival
across a query restart (second run drops all previously-seen urls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.sources.corpus import generate_corpus
from kg_microbe_merge_spark.streaming.ingest import read_corpus_stream
from kg_microbe_merge_spark.streaming.stateful import dedup_stream_by_url

N = 80


def _run(spark, corpus_dir, out_dir, ckpt):
    stream = dedup_stream_by_url(read_corpus_stream(spark, corpus_dir))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_dedup_across_restarts(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: corpus written twice -> duplicate urls within the source
    generate_corpus(spark, N, seed=42).write.mode("overwrite").parquet(corpus_dir)
    generate_corpus(spark, N, seed=42).write.mode("append").parquet(corpus_dir)
    _run(spark, corpus_dir, out_dir, ckpt)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == N                       # dupes collapsed
    assert out1.select("url").distinct().count() == N

    # batch 2: append the SAME corpus again plus new urls; restart drains
    # only the new files, and state drops the already-emitted urls
    generate_corpus(spark, N, seed=42).write.mode("append").parquet(corpus_dir)
    generate_corpus(spark, N, seed=77).write.mode("append").parquet(corpus_dir)
    _run(spark, corpus_dir, out_dir, ckpt)
    out2 = spark.read.parquet(out_dir)
    # N from seed 42 (once, ever) + N from seed 77
    assert out2.select("url").distinct().count() == 2 * N
    assert out2.count() == 2 * N
