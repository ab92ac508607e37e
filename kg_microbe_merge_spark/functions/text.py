"""Text-analysis column functions for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` —
whole-stage-codegen'd, zero Python in the hot path — and each has an
exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the driver's
DuckDB gate verifies it value-for-value.

Ops: token counting (whitespace + BPE-ish word-piece regex), language ID
(stopword-hit n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), document fingerprinting (md5 of whitespace-normalized
lowercase text — a deterministic content hash both engines share).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny high-frequency English function-word list for the lang-id / quality
# heuristics (own list; concept from the reference's unused stopwords.yaml).
LANG_EN_MARKERS = [
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "for",
]


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish sub-word proxy: count of word-piece matches
    ``[A-Za-z0-9]+|[^A-Za-z0-9\\s]`` — letters/digit runs plus each
    punctuation mark as its own token."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Deterministic content fingerprint: md5 over normalized text."""
    return F.md5(normalized_text(text))


def stopword_hits(text: Column, markers: list[str] | None = None) -> Column:
    """Number of tokens that are English function words."""
    markers = markers or LANG_EN_MARKERS
    toks = F.split(normalized_text(text), " ")
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_id_en(text: Column, min_ratio: float = 0.05) -> Column:
    """Heuristic language ID: 'en' when ≥ ``min_ratio`` of tokens are
    English function words, else 'unk'. (The real-corpus column ``lang``
    is trusted when present; this covers rows without it.)"""
    n = token_count_ws(text)
    hits = stopword_hits(text)
    ratio = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return F.when(ratio >= F.lit(min_ratio), F.lit("en")).otherwise(F.lit("unk"))


def repetition_ratio(text: Column) -> Column:
    """Most-frequent-token share of all tokens, rounded to 6 decimals —
    the standard boilerplate/spam signal (a page that is 40% one token
    is navigation chrome, not prose). 0.0 for empty text.

    Row-local: tokens are sorted once, then one ``aggregate`` fold
    counts the longest equal-run — no explode, no shuffle. The token
    array is produced behind the same CollapseProject barrier pattern as
    operators/dedup.shingle_array when called through
    :func:`with_text_metrics`-style projections.
    """
    toks = F.array_sort(F.split(normalized_text(text), " "))
    # fold state: (prev token, current run, best run) packed in a struct
    best = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n = token_count_ws(text)
    return F.when(
        n > 0, F.round(best.cast("double") / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic, rounded to 6 decimals:
    0.4·length_score + 0.3·alpha_ratio + 0.3·stopword_presence where
    length_score = min(1, n_tokens/64)."""
    n = token_count_ws(text)
    length_score = F.least(F.lit(1.0), n.cast("double") / F.lit(64.0))
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(
        n > 0, stopword_hits(text).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * length_score + F.lit(0.3) * alpha_ratio + F.lit(0.3)
        * F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
    )
    return F.round(score, 6)
