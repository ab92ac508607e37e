"""Prefix-filtered set-similarity join (AllPairs / PPJoin candidate
pruning with EXACT recall).

The scale problem with exact Jaccard pairs (operators/dedup.py
ngram_jaccard_pairs): the inverted-index join emits a candidate for
every shared token, so stop-token postings (Zipf head) dominate the
shuffle even though they never decide a match — the existing operator
caps them with ``max_doc_freq``, which is a RECALL trade (pairs whose
overlap lives in frequent tokens are lost). Prefix filtering (Bayardo
et al., "Scaling Up All Pairs Similarity Search", WWW'07; Xiao et al.,
PPJoin, WWW'08) prunes without losing anything:

    order every record's tokens by one global canonical order
    (document frequency ASC, token ASC — rarest first); for Jaccard ≥
    t, two records MUST share a token among their first
    |x| − ⌈t·|x|⌉ + 1 tokens (else even perfect agreement on the
    remaining suffix leaves the overlap below t). Index ONLY prefixes.

So the candidate join runs on the rare end of the vocabulary — the
Zipf head sits at the END of every record and is never indexed — and
the theorem guarantees every qualifying pair still collides. A length
filter (J ≥ t ⇒ t·max(|x|,|y|) ≤ min(|x|,|y|)) prunes further before
verification.

Shape at scale:

* document-frequency counts: one partially-aggregated groupBy over the
  distinct postings; the per-record rarity sort is ROW-LOCAL
  (sort_array over (freq, token) structs after one vocabulary-bounded
  join);
* prefix explode ships ~(1−t)·|x| + 1 tokens per record, not |x|;
* candidate dedup carries (doc_a, doc_b) only (the payload
  discipline); sizes re-attach at verification;
* verification is row-local ``array_intersect`` over the two token
  arrays of each surviving candidate — candidates, not the corpus,
  pay for arrays crossing the wire.

Exactness: prefix lengths and the length filter use pure BIGINT
arithmetic (threshold as a micro integer: ⌊t_micro·n / 10^6⌋ — no
float ceil on a prune boundary can ever drop a qualifying pair);
jaccard itself follows the ngram_jaccard ``round(x, 6)`` protocol.
The DuckDB oracle is the NAIVE full inverted-index formulation — no
prefix logic at all — so the gate equality is a machine-checked proof
of the pruning theorem on the gate corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.text import normalized_text


def _postings(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Distinct (doc_id, token) postings: word tokens for ``n == 1``,
    hashed n-gram shingles (the dedup.py machinery, BIGINT elements)
    for ``n >= 2`` — word sets barely discriminate templated corpora,
    shingle sets do."""
    if n >= 2:
        from kg_microbe_merge_spark.operators.dedup import shingle_postings

        return shingle_postings(df, n, text_col, id_col).select(
            "doc_id", F.col("shingle").alias("token")
        )
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: F.length(t) >= 1,
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        .select("doc_id", F.explode(F.array_distinct("t")).alias("token"))
    )


def record_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 1
) -> DataFrame:
    """Per-record canonical token arrays ``(doc_id, arr, size)`` —
    tokens sorted rarest-first by the global (doc-frequency ASC, token
    ASC) order; the row-local sort every prefix decision hangs off."""
    p = _postings(df, text_col, id_col, n)
    freq = p.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    return (
        p.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("token")))
                ),
                lambda s: s["token"],
            ).alias("arr")
        )
        .select("doc_id", "arr", F.size("arr").cast("long").alias("size"))
    )


def set_similarity_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
) -> DataFrame:
    """ALL pairs with token-set Jaccard ≥ ``threshold``:
    ``(doc_a, doc_b, inter BIGINT, jaccard DOUBLE)``, doc_a < doc_b —
    identical rows to the naive full-index join, at prefix-index cost.
    ``n >= 2`` joins on hashed n-gram shingle sets instead of word
    sets (the discriminative granularity for templated web corpora).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_micro = int(round(threshold * 1_000_000))
    sets = record_sets(df, text_col, id_col, n).persist()

    # prefix length n - floor(t*n) + 1 >= n - ceil(t*n) + 1 (the
    # theorem's bound) in exact BIGINT arithmetic — overshoot <= 1
    # token, and no float boundary can under-index
    plen = (
        F.col("size")
        - F.floor(F.lit(t_micro) * F.col("size") / F.lit(1_000_000))
        + 1
    ).cast("int")
    prefix = sets.select(
        "doc_id",
        "size",
        F.explode(F.slice("arr", 1, plen)).alias("token"),
    )
    a = prefix.select(
        F.col("token"),
        F.col("doc_id").alias("doc_a"),
        F.col("size").alias("size_a"),
    )
    b = prefix.select(
        F.col("token"),
        F.col("doc_id").alias("doc_b"),
        F.col("size").alias("size_b"),
    )
    cand = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter, exact: t*max <= min  <=>  min*1e6 >= t_micro*max
        .filter(
            F.least("size_a", "size_b") * F.lit(1_000_000)
            >= F.lit(t_micro) * F.greatest("size_a", "size_b")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("arr").alias("_arr_a"),
        F.col("size").alias("size_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("arr").alias("_arr_b"),
        F.col("size").alias("size_b"),
    )
    inter = F.size(F.array_intersect("_arr_a", "_arr_b")).cast("long")
    # filter on the RAW ratio (the quantity the prefix/length theorems
    # bound — a round(x, 6) >= t filter would admit pairs with true
    # J in [t - 5e-7, t) that the pruning is allowed to drop); the
    # rounded column is display protocol only, and the oracle compares
    # the identical raw division
    raw_j = F.col("inter") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", inter)
        .filter(raw_j >= threshold)
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        F.round(raw_j, 6).alias("jaccard"),
    )
