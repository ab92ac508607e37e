"""TF-IDF top-k characteristic terms per document.

The classic corpus-statistics operator: term frequency per (doc, term),
document frequency per term over the whole corpus, weight = tf · idf
with the smoothed idf ``ln((N + 1) / (df + 1)) + 1``, then the top-k
terms per document with a total deterministic order (weight desc, term
asc).

Shape at scale (the part that matters at 100 TB):

- token production is row-local (split on the shared whitespace
  normalizer) and explodes inside the same stage as the scan — no
  pre-explode exchange;
- TF is one ``groupBy(doc_id, term)`` — partially aggregated map-side,
  and because a document's tokens are produced inside one task, the
  map-side combiner collapses almost all duplicates before the shuffle;
- DF re-aggregates the TF output by term (``countDistinct`` is not
  needed — TF rows are already distinct per (doc, term), so DF is a
  plain ``count``), again map-side partial;
- N (corpus size) rides along as a literal computed once;
- the DF table joins back to TF on ``term``. Vocabulary tables are
  small relative to the corpus (sublinear growth), so the join is
  broadcast whenever DF fits the threshold; at truly unbounded vocab it
  degrades to a shuffle join on the SAME key the TF aggregation just
  produced — AQE reuses the partitioning, no extra exchange of the big
  side;
- top-k per doc is one window over ``partitionBy(doc_id)`` — the only
  row-multiplying step is bounded by k.

Reference parity: the reference has no corpus-statistics operators
(DuckDB merge of ontology TSVs); this is part of the training-data
analytics family the brief mandates. Exact DuckDB twin in
``__spark_entry__.oracle_sql['tfidf_topk']``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.text import normalized_text


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 2,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Returns (id_col, term, tf, df, weight, rank); ``weight`` rounded to
    6 decimals (the cross-engine float protocol used by every oracle-
    gated score in this repo). Tokens shorter than ``min_token_len``
    are dropped (single letters are noise and inflate DF).
    """
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: F.length(t) >= min_token_len,
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("term"))

    tf = exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # TF rows are distinct per (doc, term) → DF is a plain count
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()

    weighted = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.round(
            F.col("tf")
            * (
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                + 1.0
            ),
            6,
        ).alias("weight"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "weight", "rank")
    )
