"""Sliding-window document chunking: segment long documents into
fixed-size token windows with overlap — the standard preparation of a
curated corpus into LLM training sequences (window = max sequence
length; overlap = ``window - stride`` preserves context across chunk
boundaries). Complements ``operators/packing.py``: chunking CUTS long
documents down to sequence length, packing BINS short ones up to it.

Semantics (mirrored exactly by the DuckDB oracle in
``__spark_entry__`` and the pure-Python oracle in
``tests/test_chunking.py``): tokens are the whitespace split of the
text with empty tokens dropped (identical to Python ``str.split()`` —
robust to tabs/newlines/leading/trailing runs); chunk ``k`` starts at
token offset ``k * stride`` and takes up to ``window`` tokens;
emission STOPS with the first chunk whose window reaches the end of
the document (``start + window >= n_tok``), so no chunk is ever a
strict subset of its predecessor, a document of ``<= window`` tokens
yields exactly one chunk, and empty documents yield none. Output
cardinality per doc is ``1 + ceil(max(n_tok - window, 0) / stride)``.
Chunk text re-joins tokens with single spaces (whitespace-normalized,
like every token-level operator here).

Scale design: everything is ROW-LOCAL — one projection materializes
the token array once (referenced more than once downstream, so
CollapseProject cannot inline the split into the lambda; the
``shingle_array`` barrier pattern, operators/dedup.py), one
``transform`` builds the chunk structs over a ``sequence`` of starts,
one ``explode_outer`` emits them (outer for the same
InferFiltersFromGenerate reason documented at
``dedup.shingle_postings`` — plain explode would inline the transform
a second time as a ``size > 0`` pre-filter). Zero exchange, zero
Python, whole-stage codegen; output cardinality is bounded and
predictable for the downstream shuffle-free writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return ``(id_col, chunk_idx, chunk_text, n_tok)`` — one row per
    sliding window. ``stride < window`` gives overlapping context;
    ``stride == window`` gives disjoint chunks. ``stride > window``
    would silently drop tokens between chunks, so it is rejected."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window would drop tokens between chunks")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    # drop empty/whitespace-only docs BEFORE tokenizing, on the raw
    # column: a `size(_toks) > 0` filter after the projection gets
    # pushed through it and inlines the tokenize chain a second time
    # per row (verified in the physical plan); `rlike('\\S')` is one
    # cheap scan-side regex and keeps the split single
    base = df.filter(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col), toks.alias("_toks")
    )
    n = F.size(F.col("_toks"))
    # starts = 0, stride, ..., up to the first start whose window
    # covers the end: last start = ceil(max(n-window,0)/stride)*stride
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - window, F.lit(0)) + F.lit(stride - 1),
        F.lit(stride),
    )
    chunk = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("_toks"), s + 1, window), " "
            ).alias("chunk_text"),
            F.least(F.lit(window), n - s).alias("n_tok"),
        ),
    )
    return (
        base.select(id_col, F.explode_outer(chunk).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tok").alias("n_tok"),
        )
    )
