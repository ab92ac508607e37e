"""Tokenizer-vocabulary induction over a document corpus.

Training-data pipelines build tokenizers FROM the corpus: count every
token (wordcount at 100 TB), keep the top-V by frequency, assign stable
ids, and — for BPE-style tokenizers — count adjacent token pairs to
pick merge candidates. Both are expressed as classic two-phase
aggregations; nothing here leaves the JVM.

Scale notes
-----------
* ``token_counts`` is THE canonical map-side-combinable aggregation:
  tokens are produced row-locally (same normalize+split as the shingle
  family), partially counted per map partition, and the shuffle carries
  (token, partial_count) — never documents. Skew (the word "the" at
  10^11 occurrences) is exactly what partial aggregation erases: each
  map partition contributes ONE row per hot token.
* ``top_vocab`` never globally sorts the full token-count table: the
  top-V is selected with ``orderBy().limit(V)`` — Spark plans that as
  a distributed TakeOrdered (per-partition top-V, then a driver-side
  merge of V·partitions candidates) — and only the V surviving rows
  (a tokenizer vocab is 10^4-10^6) pass through the single-partition
  id-assignment window. A count floor (``min_count``) additionally
  caps the candidate universe at corpus_tokens/min_count rows.
* ``bpe_pair_counts`` builds adjacent pairs row-locally with
  ``transform`` over the token array (zero explode of intermediate
  state, one exchange for the pair count), the exact counting step of a
  BPE merge iteration.

Determinism contract: ties in frequency break lexicographically
(count DESC, token ASC), so vocab ids are stable across runs/engines —
the DuckDB oracle mirrors the identical ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def _token_arrays(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks")
    ).filter(F.size("_toks") > 0)


def token_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide ``(token, n)`` counts (tokens from the shared
    normalize+split; empty documents contribute nothing)."""
    toks = _token_arrays(df, text_col)
    out = (
        toks.select(F.explode("_toks").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def top_vocab(
    df: DataFrame,
    size: int,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Top-``size`` vocabulary ``(token_id, token, n)`` with stable ids:
    rank by (n DESC, token ASC), ids starting at 0.

    The candidate cut is ``orderBy().limit(size)`` (distributed
    TakeOrdered); only the ≤ ``size`` survivors go through the
    id-assignment window, so the single-partition step is bounded by
    the vocab size, never the token universe."""
    counts = token_counts(df, text_col, min_count)
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(size)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long")
    ).select("token_id", "token", "n")


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Adjacent-token-pair counts ``(lhs, rhs, n)`` — the counting
    step of one BPE merge iteration, with pairs built row-locally from
    the token array (one exchange: the pair groupBy). Columns are
    ``lhs``/``rhs`` (LEFT/RIGHT are SQL keywords)."""
    toks = _token_arrays(df, text_col)
    t = F.col("_toks")
    pairs = toks.select(
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - F.lit(2)),
                    lambda i: F.struct(
                        F.element_at(t, i + 1).alias("lhs"),
                        F.element_at(t, i + 2).alias("rhs"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<lhs:string,rhs:string>>")
            ),
        ).alias("p")
    )
    out = (
        pairs.select(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out
