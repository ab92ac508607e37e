"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
algorithm) + fingerprint-overlap candidate pairs.

THE document-fingerprinting operator for partial-overlap detection at
corpus scale: hash every k-token gram, slide a w-hash window, keep each
window's minimum — the guarantee is that any shared run of w+k-1 tokens
between two documents yields at least one shared fingerprint, while the
fingerprint set is ~2/(w+1) of the gram count (sublinear storage, and
robust to insertions/deletions where whole-doc hashes break).

Shape at scale:

- gram hashing AND window-min selection are entirely row-local (array
  expressions inside the scan stage — no explode before selection);
  only the selected minima explode, so the shuffle sees ~2/(w+1) of
  the grams;
- overlap detection is the inverted-index join (the same
  shape as ``dedup.ngram_jaccard_pairs``): group by fingerprint,
  pair docs within a posting, count shared prints per pair — a
  ``max_doc_freq`` ceiling drops boilerplate prints before the
  self-join (a fingerprint shared by thousands of docs is stop-text,
  and it is the quadratic term);
- the hash is the repo's portable md5-derived ``hash60`` rather than a
  Karp–Rabin rolling hash: at 100 TB the hash cost is codegen-cheap
  next to the shuffle it feeds, the selection guarantees depend only on
  hash uniformity, and md5 is reproducible bit-for-bit in the DuckDB
  oracle / python twin (a true O(1)-per-shift rolling hash would save
  CPU the pipeline doesn't miss and cost the value-level gate).

Reference parity: not in the reference; completes the mandated text-
analysis family (lang-id / quality / tokens / fingerprinting) with the
overlap-robust fingerprint the whole-doc md5 (`functions/text.py
fingerprint_md5`) cannot provide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60
from kg_microbe_merge_spark.functions.text import normalized_text


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct winnowing fingerprints per document:
    (id_col, fp BIGINT). Guarantee: two documents sharing any run of
    ``w + k - 1`` tokens share at least one fingerprint.

    STAGED projections, not one expression: the token array and the
    gram-hash array each materialize in their own Project and are
    referenced as attributes downstream (the ``shingle_array`` barrier
    pattern, operators/dedup.py:86). Building them inline would embed
    the gram subtree in EVERY window lambda — Column expressions are
    trees, so each reference is a runtime re-evaluation — turning the
    per-row cost from O(n·w) into O(n²) md5 calls (measured: 671 s vs
    ~2 s for the sf0.1 gate query)."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: F.length(t) >= 1,
    )
    s1 = df.select(F.col(id_col), toks.alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    # gram i (1-based): tokens[i .. i+k-1], joined by single spaces.
    # NB: F.sequence(1, 0) is a DESCENDING [1, 0], not empty — the
    # n < k case needs an explicit typed empty array
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: hash60(F.array_join(F.slice(t, i, k), " ")),
    )
    s2 = s1.select(
        F.col(id_col),
        F.when(n >= k, grams)
        .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
        .alias("_g"),
    )
    g = F.col("_g")
    ng = F.size(g)
    # windows j = 1 .. ng-w+1; a doc shorter than one window (but with
    # ≥1 gram) fingerprints its global min (degenerate window); no
    # grams → no fingerprints.
    widx = F.when(
        ng > 0, F.sequence(F.lit(1), F.greatest(ng - F.lit(w - 1), F.lit(1)))
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    mins = F.transform(
        widx,
        lambda j: F.array_min(F.slice(g, j, F.least(F.lit(w), ng))),
    )
    return (
        s2.select(F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp"))
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate overlapping pairs: (doc_a, doc_b, shared BIGINT) with
    doc_a < doc_b, sharing ≥ ``min_shared`` fingerprints. Fingerprints
    occurring in > ``max_doc_freq`` documents are dropped before the
    self-join (boilerplate text is the quadratic term)."""
    from pyspark.sql import Window

    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col
    )
    # doc-frequency as a window over the posting stream, NOT a
    # groupBy+join: the ceiling filter then sits on the SAME plan both
    # self-join sides share, so Spark's ReuseExchange materializes the
    # postings once (the groupBy+join form re-derived every fingerprint
    # from text a second time — same finding as duplicated_span_stats)
    kept = fps.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("_df") <= max_doc_freq)
    a = kept.select(F.col("fp"), F.col(id_col).alias("doc_a"))
    b = kept.select(F.col("fp"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def winnow_py(text: str, k: int = 5, w: int = 4) -> set[int]:
    """Python twin of :func:`winnow_fingerprints` for one document."""
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    if len(toks) < k:
        return set()
    grams = [
        hash60_py(" ".join(toks[i : i + k]))
        for i in range(len(toks) - k + 1)
    ]
    if len(grams) < w:
        return {min(grams)}
    return {
        min(grams[j : j + w]) for j in range(len(grams) - w + 1)
    }
