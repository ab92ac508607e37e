"""Bigram language-model perplexity scoring (CCNet-style quality filter).

The canonical model-based corpus filter (Wenzek et al., CCNet; also the
quality signal in Gopher/RefinedWeb recipes): train an n-gram LM on the
corpus, score every document by its average per-token bits
(log-perplexity), and filter/bucket on the score. Documents whose
bigrams are globally rare score high (gibberish, boilerplate soup);
fluent in-distribution text scores low. This module is the exact
distributed formulation for n=2 with add-k smoothing:

    bits(w1 w2) = -log2( (c(w1,w2) + k) / (c(w1,·) + k·V) )
    doc score   = mean over the doc's bigram instances of bits(...)

where ``c`` are corpus-wide counts, ``c(w1,·)`` the context total and
``V`` the continuation-vocabulary size.

Shape at scale (what survives 100 TB):

- bigram production is row-local: two ``slice``s + ``arrays_zip`` over
  the token array inside the scan stage — no pre-explode exchange;
- the count tables are ONE ``groupBy`` each, partially aggregated
  map-side; a document's bigrams are produced inside one task, so the
  map-side combiner collapses the Zipf head before the shuffle;
- the model (bigram counts + context totals) is vocabulary-bounded —
  sublinear in corpus size — so the score-time joins broadcast in
  practice; at unbounded vocab they degrade to shuffle joins on the
  SAME keys the count aggregations just produced (AQE reuses the
  partitioning for the count side);
- the per-doc reduction ships one BIGINT per (doc, distinct bigram) —
  never the text;
- the float protocol pins per-bigram bits to micro-bits with
  ``floor(x·1e6 + 0.5)`` (no round-half-mode ambiguity — engine
  ``round()`` implementations genuinely disagree there), sums them as
  BIGINT (exact, order-free), and divides once at the end, so the
  DuckDB oracle twin matches value-for-value. Residual cross-engine
  risk: ``log2`` is transcendental and IEEE does not pin its last ulp,
  so a bits value landing within 1 ulp of a micro-boundary could
  differ by 1 micro-bit between JVM and libm (~1e-8 chance per
  distinct (cb, cw) pair; none observed over the gate corpora).

Reference parity: the reference (DuckDB TSV merge) has no corpus LM;
this is part of the training-data curation family the brief mandates
alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.text import normalized_text


def bigram_instances(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Row-local bigram production: (id_col, w1, w2), one row per
    bigram INSTANCE (duplicates preserved — these are LM counts, not
    shingle postings). Documents with < 2 tokens emit nothing."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: F.length(t) >= 1,
    )
    d = df.select(F.col(id_col), toks.alias("t"))
    # slice lengths are max(size-1, 0): empty/one-token docs zip to []
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice("t", F.lit(1), n1).alias("w1"),
        F.slice("t", F.lit(2), n1).alias("w2"),
    )
    return d.select(
        id_col, F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_model(inst: DataFrame):
    """Corpus bigram counts, context totals, and continuation-vocab
    size. Returns (counts_df(w1, w2, cb), context_df(w1, cw), V).
    ``V`` is a driver-side int — it is a literal in the scoring
    expression, mirroring the oracle.

    ``cb`` (the trained model) is persisted: it is vocabulary-bounded
    (sublinear in corpus size), and caching it means the corpus is
    scanned exactly twice total — once here to train, once in the
    score join — instead of once per consumer (the V count, the cw
    roll-up, and the score join all reuse the cached counts)."""
    cb = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cb = cb.persist()
    cw = cb.groupBy("w1").agg(F.sum("cb").alias("cw"))
    v = cb.select("w2").distinct().count()  # materializes the cache
    return cb, cw, v


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document average bigram bits under the corpus-trained add-k
    LM. Returns (id_col, n_bigrams BIGINT, avg_bits DOUBLE) — every
    input document appears; docs with < 2 tokens carry n_bigrams=0 and
    NULL avg_bits.

    ``avg_bits`` follows the integer micro-bits protocol (see module
    docstring): exact across engines, safe to hash-compare.
    """
    inst = bigram_instances(df, text_col=text_col, id_col=id_col)
    cb, cw, v = bigram_model(inst)

    bits = -F.log2(
        (F.col("cb") + F.lit(k)) / (F.col("cw") + F.lit(k * v))
    )
    micro = F.floor(bits * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    scored = (
        inst.join(cb, ["w1", "w2"])
        .join(cw, "w1")
        .select(F.col(id_col), micro.alias("micro"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("micro").alias("s_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            # floor protocol for the final division too: s/n lands on
            # exact .5 micro-boundaries whenever n is even and
            # s ≡ n/2 (mod n), where engine round() implementations
            # disagree (Java shortest-string HALF_UP vs C multiply+
            # half-away); floor(s/n + 0.5) is the same IEEE op
            # sequence everywhere
            (
                F.floor(
                    F.col("s_micro") / F.col("n_bigrams") + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("avg_bits"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    max_bits: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Keep documents whose average bigram bits are ≤ ``max_bits``
    (drops high-perplexity gibberish; docs too short to score are
    dropped too, matching CCNet's length prefilter)."""
    scores = bigram_lm_scores(df, text_col=text_col, id_col=id_col, k=k)
    keep = scores.filter(
        F.col("avg_bits").isNotNull() & (F.col("avg_bits") <= max_bits)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
