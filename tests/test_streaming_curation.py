"""Continuous corpus curation (streaming/curation.py): the crawl→chunks
stream equals the batch composition over the same files; checkpoint
resume drains only new files; the streaming plan is stateless."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.sources.corpus import generate_corpus
from kg_microbe_merge_spark.streaming.curation import (
    curated_chunk_stream,
    run_curation_stream,
)

N = 120
PARAMS = dict(window=24, stride=16, min_quality=0.3)


def _rows(df):
    return sorted(
        (r["url"], r["chunk_idx"], r["chunk_text"], r["n_tok"])
        for r in df.collect()
    )


def test_curation_stream_matches_batch_and_resumes(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")

    generate_corpus(spark, N, seed=7).write.mode("overwrite").parquet(corpus_dir)
    q = run_curation_stream(spark, corpus_dir, out_dir, ckpt, **PARAMS)
    q.awaitTermination(120)

    got = _rows(spark.read.parquet(out_dir))
    want = _rows(
        curated_chunk_stream(spark.read.parquet(corpus_dir), **PARAMS)
    )
    assert got == want
    assert len(got) > 0  # the filter did not silently drop everything

    # new crawl files arrive; resume from the checkpoint drains ONLY
    # them (exactly-once: totals equal the batch over the union)
    generate_corpus(spark, N, seed=8).write.mode("append").parquet(corpus_dir)
    q2 = run_curation_stream(spark, corpus_dir, out_dir, ckpt, **PARAMS)
    q2.awaitTermination(120)
    total = _rows(spark.read.parquet(out_dir))
    want_all = _rows(
        curated_chunk_stream(spark.read.parquet(corpus_dir), **PARAMS)
    )
    assert total == want_all

    # nothing new -> nothing appended (replay idempotence)
    q3 = run_curation_stream(spark, corpus_dir, out_dir, ckpt, **PARAMS)
    q3.awaitTermination(120)
    assert _rows(spark.read.parquet(out_dir)) == want_all


def test_curation_quality_gate_filters(spark):
    # an empty-text doc and a low-quality doc must yield no chunks
    rows = [
        ("u1", "good clean english text with many reasonable words here", "en"),
        ("u2", "", "en"),
        ("u3", "zz zz zz zz zz zz zz zz zz zz zz zz", "en"),
        ("u4", "bonne phrase française assez longue pour le test", "fr"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    from kg_microbe_merge_spark.functions.text import quality_score
    from kg_microbe_merge_spark.operators.chunking import chunk_documents

    good = df.filter(
        (F.col("lang") == "en") & (quality_score(F.col("text")) >= 0.3)
    )
    out = chunk_documents(good, window=4, stride=4, text_col="text", id_col="url")
    urls = {r["url"] for r in out.collect()}
    assert "u1" in urls and "u2" not in urls and "u4" not in urls


def test_gopher_tier_stream_matches_batch(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus_g")
    out_dir = str(tmp_path / "chunks_g")
    ckpt = str(tmp_path / "ckpt_g")
    generate_corpus(spark, N, seed=5).write.parquet(corpus_dir)
    q = run_curation_stream(
        spark, corpus_dir, out_dir, ckpt, gopher=True, **PARAMS
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(out_dir))
    want = _rows(
        curated_chunk_stream(
            spark.read.parquet(corpus_dir), gopher=True, **PARAMS
        )
    )
    assert got == want and len(got) > 0
    # the extra tier only ever removes documents
    loose = _rows(curated_chunk_stream(spark.read.parquet(corpus_dir), **PARAMS))
    assert set(u for u, *_ in got) <= set(u for u, *_ in loose)
