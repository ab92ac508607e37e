"""BM25 keyword retrieval over the corpus — score every document
against a bag of query terms and return the top-k.

Completes the retrieval family next to the vector side
(:mod:`.similarity` / :mod:`.quantize`): TF-IDF (:mod:`.tfidf`)
characterizes documents, BM25 *ranks* them for a query — the standard
lexical scorer (Robertson/Sparck Jones probabilistic idf with the
Okapi tf saturation and length normalization)::

    idf(t)       = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d, q)  = Σ_{t ∈ q} idf(t) · tf_td·(k1+1)
                              / (tf_td + k1·(1 - b + b·dl_d/avgdl))

Shape at scale (a handful of query terms, a 100 TB corpus):

- **two scans, zero joins, zero explodes**: pass 1 computes the exact
  integer corpus statistics (N, Σdl, and per-term df) in ONE partial
  aggregation — df for each query term is a row-local
  ``array_contains`` flag summed map-side, so the shuffle carries one
  row of ``2 + |q|`` longs per partition. Pass 2 inlines those stats
  as literals and scores row-locally: per-term tf is a row-local
  filtered-array count, the per-doc score a fixed left-associated sum
  over the terms — whole-stage codegen, no exchange until the final
  bounded top-k (``TakeOrderedAndProject``).
- the posting-list inversion a dedicated search engine would build is
  deliberately absent: for ad-hoc scoring, inverting the corpus costs
  a full shuffle of every token — strictly worse than two scans unless
  the same corpus serves many queries (in that case build the TF table
  once via :mod:`.tfidf`'s machinery and reuse it).

Cross-engine float protocol: every statistic entering the double math
is an exact integer (tf, df, dl, N, Σdl), the expression tree is
token-identical in the DuckDB twin (same literal association order),
and the final score is pinned with the repo's ``floor(x·1e6 + 0.5)``
micro-unit rule — ``ln`` on identical double inputs agrees across
engines here (the :mod:`.tfidf` gate established this).

Reference parity: the reference has no retrieval operators; this is
part of the training-data analytics family the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.text import normalized_text

MICRO = 1000000.0


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 2,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by BM25.

    Returns ``(id_col, dl, score)`` — ``dl`` the document token length,
    ``score`` micro-rounded to 6 decimals — ordered (score desc,
    id asc), only docs matching ≥1 term. Tokenization matches
    :mod:`.tfidf`: lowercased, whitespace-split, tokens shorter than
    ``min_token_len`` dropped.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: F.length(t) >= min_token_len,
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "dl", F.size("_toks").cast("long")
    )

    # pass 1: exact integer corpus stats in one partial aggregation
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"df{i}")
            for i, t in enumerate(query_terms)
        ],
    ).first()
    n, sum_dl = stats["n"], stats["sum_dl"]
    if n == 0:
        return base.select(id_col, "dl").withColumn(
            "score", F.lit(0.0)
        ).limit(0)

    # pass 2: row-local scoring with the stats inlined as literals.
    # idf is computed ENGINE-SIDE (F.log here, ln in the oracle) from
    # the same exact integers, so both engines run ln on identical
    # doubles; avgdl enters as the exact division sum_dl/n
    avgdl = F.lit(float(sum_dl)) / F.lit(float(n))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        tf = F.size(
            F.filter(F.col("_toks"), lambda x: x == F.lit(t))
        ).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n - stats[f"df{i}"]) + 0.5))
            / (F.lit(float(stats[f"df{i}"]) + 0.5))
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)

    # top-k BEFORE the score>0 filter: non-matching docs (score 0) sort
    # below every match, so limit-then-filter ≡ filter-then-limit — and
    # the limit blocks predicate pushdown, which would otherwise
    # substitute the entire scoring expression into a scan-level Filter
    # and tokenize+score every row TWICE (plan-audited; PLANS.md)
    out = (
        base.select(
            id_col,
            "dl",
            (
                F.floor(score * F.lit(MICRO) + F.lit(0.5)).cast("bigint")
                / F.lit(MICRO)
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .filter(F.col("score") > 0.0)
    )
    return out
