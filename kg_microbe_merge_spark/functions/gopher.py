"""Gopher-style corpus quality rules (Rae et al. 2021, appendix A1.1):
the standard heuristic filter battery a web-scale LLM training pipeline
runs after extraction and before dedup — repetition signals (top /
duplicated word-n-gram character fractions, duplicate lines), shape
signals (mean word length, symbol-to-word ratio, alphabetic-word
fraction), and a composite keep decision.

Complements ``functions/text.py`` (length / stopword / alpha-ratio
composite score) and ``functions/quality_model.py`` (model-based
filtering): Gopher rules are the *rule-based* tier of the curation
stack, and their repetition family is the document-LOCAL cousin of the
corpus-level substring dedup in ``operators/dedup.py``.

Scale design: every signal is ROW-LOCAL and JVM-side — the token array
is materialized ONCE behind a projection barrier (the ``shingle_array``
pattern, operators/dedup.py), n-gram arrays are built with
``transform`` over a ``sequence`` of offsets, and the per-document
mode / duplicate-mass statistics come from one ``aggregate`` fold over
the SORTED gram array (the ``repetition_ratio`` fold, functions/
text.py) — no explode, no shuffle, zero Python, whole-stage codegen.
At 100 TB the operator is a pure map over the corpus scan.

Cross-engine exactness: every fraction is pinned with the repo's
integer micro protocol ``floor(x·1e6 + 0.5)/1e6`` (no round-half-mode
ambiguity between Spark, DuckDB and Python); numerators and
denominators are exact integers (character counts, run lengths), so
the DuckDB twin in ``__spark_entry__`` (which computes the same
statistics relationally via ``unnest`` + GROUP BY instead of the fold)
matches value-for-value.

Tie-break (documented, both engines): the "top" n-gram is the most
frequent one, ties resolved to the lexicographically smallest gram —
in the fold this is free (grams are scanned in sorted order and the
best slot only updates on a strictly longer run); relationally it is
``ORDER BY c DESC, gram ASC LIMIT 1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized_text

# Composite-keep thresholds (the Gopher paper's published cut-offs for
# the signals representable on a single-line corpus).
DEFAULT_THRESHOLDS = {
    "min_n_tok": 5,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.8,
    "max_top_2gram_frac": 0.5,
    "max_top_3gram_frac": 0.4,
    "max_dup_5gram_frac": 0.6,
}


def _micro6(x: Column) -> Column:
    """floor(x·1e6 + 0.5)/1e6 — the repo's cross-engine round-6 pin."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("bigint") / F.lit(
        1000000.0
    )


def _ratio6(num: Column, den: Column) -> Column:
    """Pinned num/den with a 0-denominator guard (0.0, like text.py)."""
    return F.when(
        den > 0, _micro6(num.cast("double") / den.cast("double"))
    ).otherwise(F.lit(0.0))


def ngram_array(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as single-space-joined strings;
    empty array when the document has fewer than ``n`` tokens (guarded
    explicitly — ``sequence(0, negative)`` would DESCEND, not empty)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_run_stats(sorted_grams: Column) -> Column:
    """One fold over a SORTED gram array → struct(best_run, best_gram,
    dup_chars): the longest equal-run (most frequent gram, ties to the
    lexicographically smallest), and the total characters covered by
    every occurrence of every gram appearing ≥ 2 times (the first
    occurrence is charged retroactively when the second is seen)."""
    return F.aggregate(
        sorted_grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit("").alias("best_gram"),
            F.lit(0).cast("bigint").alias("dup_chars"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                t,
            )
            .otherwise(acc["best_gram"])
            .alias("best_gram"),
            (
                acc["dup_chars"]
                + F.when(
                    t == acc["prev"],
                    # count this occurrence; when the run just reached 2,
                    # also charge the first occurrence
                    F.length(t)
                    * F.when(acc["run"] == 1, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("dup_chars"),
        ),
        lambda acc: F.struct(
            acc["best"].alias("best_run"),
            acc["best_gram"].alias("best_gram"),
            acc["dup_chars"].alias("dup_chars"),
        ),
    )


def top_ngram_char_fraction(toks: Column, norm_len: Column, n: int) -> Column:
    """Fraction of normalized-text characters covered by occurrences of
    the most frequent word ``n``-gram (count × gram length / text
    length). The Gopher repetition signal for n ∈ {2, 3, 4}."""
    s = top_run_stats(F.array_sort(ngram_array(toks, n)))
    covered = F.when(
        s["best_run"] >= 1, s["best_run"] * F.length(s["best_gram"])
    ).otherwise(F.lit(0))
    return _ratio6(covered, norm_len)


def duplicate_ngram_char_fraction(
    toks: Column, norm_len: Column, n: int
) -> Column:
    """Fraction of normalized-text characters covered by word
    ``n``-grams occurring more than once (all occurrences charged,
    capped at 1.0 — adjacent occurrences share separator chars, so the
    raw mass can exceed the text length). Gopher's dup-n-gram signal
    for n ∈ {5..10}."""
    s = top_run_stats(F.array_sort(ngram_array(toks, n)))
    return F.least(F.lit(1.0), _ratio6(s["dup_chars"], norm_len))


def mean_word_length(toks: Column, norm_len: Column) -> Column:
    """Mean characters per token — exact arithmetic identity on the
    single-space-joined normalized text: (len - (n-1)) / n."""
    n = F.size(toks)
    return F.when(
        n > 0,
        _micro6(
            (norm_len - (n - F.lit(1))).cast("double") / n.cast("double")
        ),
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column, toks: Column) -> Column:
    """(# count + ellipsis count) / n_tok — Gopher's symbol-to-word
    ratio, computed on the RAW text (symbols survive normalization
    anyway, but raw keeps the definition source-faithful)."""
    hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipses = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    return _ratio6(
        hashes.cast("double") + ellipses.cast("double"), F.size(toks)
    )


def alpha_word_fraction(toks: Column) -> Column:
    """Fraction of tokens containing at least one letter (normalized →
    lowercase, so ``[a-z]``)."""
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return _ratio6(hits, F.size(toks))


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line (occurrence
    count beyond the first, over total lines). Degenerate (0.0) on
    single-line corpora; real on crawl text with newlines."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n = F.size(lines)
    distinct_n = F.size(F.array_distinct(lines))
    return _ratio6(n - distinct_n, n)


def gopher_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tok, mean_word_len, symbol_word_ratio, alpha_word_frac,
    top_2gram_frac, top_3gram_frac, dup_5gram_frac, dup_line_frac) —
    one row per document, all signals from ONE tokenization.

    Plan shape: select(norm/len/toks barrier) → select(signals). The
    token array is referenced by every signal, so CollapseProject keeps
    the split single; zero Exchange in the whole plan.
    """
    norm = normalized_text(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        F.length(norm).alias("_nlen"),
        F.filter(F.split(norm, " "), lambda t: t != F.lit("")).alias("_toks"),
    )
    toks = F.col("_toks")
    nlen = F.col("_nlen")
    return base.select(
        id_col,
        F.size(toks).alias("n_tok"),
        mean_word_length(toks, nlen).alias("mean_word_len"),
        symbol_word_ratio(F.col("_raw"), toks).alias("symbol_word_ratio"),
        alpha_word_fraction(toks).alias("alpha_word_frac"),
        top_ngram_char_fraction(toks, nlen, 2).alias("top_2gram_frac"),
        top_ngram_char_fraction(toks, nlen, 3).alias("top_3gram_frac"),
        duplicate_ngram_char_fraction(toks, nlen, 5).alias("dup_5gram_frac"),
        duplicate_line_fraction(F.col("_raw")).alias("dup_line_frac"),
    )


def gopher_keep(
    signals: DataFrame, thresholds: dict | None = None
) -> DataFrame:
    """Append the composite ``keep`` decision to a signal frame."""
    t = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    c = F.col
    keep = (
        (c("n_tok") >= t["min_n_tok"])
        & (c("mean_word_len") >= t["min_mean_word_len"])
        & (c("mean_word_len") <= t["max_mean_word_len"])
        & (c("symbol_word_ratio") <= t["max_symbol_word_ratio"])
        & (c("alpha_word_frac") >= t["min_alpha_word_frac"])
        & (c("top_2gram_frac") <= t["max_top_2gram_frac"])
        & (c("top_3gram_frac") <= t["max_top_3gram_frac"])
        & (c("dup_5gram_frac") <= t["max_dup_5gram_frac"])
    )
    return signals.withColumn("keep", keep)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """Keep only documents passing the composite rule battery — the
    curation-pipeline form: df in → filtered df out, original columns
    preserved. Zero join, zero shuffle: the signals are appended as
    projections over the same tokenize-once barrier, the composite
    predicate filters, and the helper columns are dropped — one map
    stage over the corpus scan at any scale."""
    t = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    norm = normalized_text(F.col(text_col))
    base = df.select(
        "*",
        F.length(norm).alias("_nlen"),
        F.filter(F.split(norm, " "), lambda x: x != F.lit("")).alias("_toks"),
    )
    toks, nlen = F.col("_toks"), F.col("_nlen")
    mwl = mean_word_length(toks, nlen)
    keep = (
        (F.size(toks) >= t["min_n_tok"])
        & (mwl >= t["min_mean_word_len"])
        & (mwl <= t["max_mean_word_len"])
        & (symbol_word_ratio(F.col(text_col), toks) <= t["max_symbol_word_ratio"])
        & (alpha_word_fraction(toks) >= t["min_alpha_word_frac"])
        & (top_ngram_char_fraction(toks, nlen, 2) <= t["max_top_2gram_frac"])
        & (top_ngram_char_fraction(toks, nlen, 3) <= t["max_top_3gram_frac"])
        & (
            duplicate_ngram_char_fraction(toks, nlen, 5)
            <= t["max_dup_5gram_frac"]
        )
    )
    return base.filter(keep).drop("_nlen", "_toks")
