"""Continuous corpus curation: crawl stream → LLM training chunks.

The streaming face of the batch curation path (``q_corpus_curation`` +
``operators/chunking.py``): as crawl files land, extract text, keep
quality English documents, cut them into fixed-size token windows, and
append the chunks to a partitioned parquet shard table with the file
sink's exactly-once semantics. This is the "training-data feed" a
continuously-crawling 100 TB pipeline runs instead of periodic batch
jobs — and because every stage here is a stateless row-local transform
(pandas-UDF extraction, JVM quality scoring, the zero-exchange chunker),
the streaming plan involves NO state store and NO watermark: each
micro-batch is embarrassingly parallel, so the stream's throughput
scales exactly like the batch job's.

Stream ≡ batch is the tested invariant (``tests/test_streaming_curation``):
the same composition over the same files yields the same chunk set,
and checkpoint resume drains only newly-arrived files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import with_extracted_text
from ..functions.gopher import gopher_filter
from ..functions.text import quality_score
from ..operators.chunking import chunk_documents
from .ingest import read_corpus_stream


def curated_chunk_stream(
    corpus_stream: DataFrame,
    window: int = 128,
    stride: int = 96,
    min_quality: float = 0.5,
    lang: str = "en",
    gopher: bool = False,
) -> DataFrame:
    """corpus stream → (url, chunk_idx, chunk_text, n_tok) stream.

    Works identically on a batch DataFrame (one definition, two
    execution modes — the module convention, streaming/ingest.py).
    ``gopher=True`` adds the Gopher rule battery
    (functions/gopher.py) as a second quality tier after the composite
    score — still a stateless row-local map, so the streaming plan
    stays state-store-free."""
    extracted = with_extracted_text(corpus_stream).select("url", "text", "lang")
    good = extracted.filter(
        (F.col("lang") == lang) & (quality_score(F.col("text")) >= min_quality)
    )
    if gopher:
        good = gopher_filter(good, text_col="text", id_col="url")
    return chunk_documents(
        good, window=window, stride=stride, text_col="text", id_col="url"
    )


def run_curation_stream(
    spark: SparkSession,
    corpus_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: int = 128,
    stride: int = 96,
    min_quality: float = 0.5,
    available_now: bool = True,
    gopher: bool = False,
):
    """Launch the crawl→chunks feed writing parquet with exactly-once
    file-sink semantics. ``available_now=True`` drains what is currently
    in the source and stops (the incremental-batch / Iceberg pattern);
    False runs continuously."""
    stream = curated_chunk_stream(
        read_corpus_stream(spark, corpus_dir),
        window=window,
        stride=stride,
        min_quality=min_quality,
        gopher=gopher,
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
