"""Token-blocking entity-resolution candidate generation
(schema-agnostic blocking in the MinoanER/JedAI style — EDBT 2019 —
re-expressed as DataFrame ops).

The north-star pipeline reconciles cross-source entity IDs as
connected components over ``same_as`` edges. The broadcast
alias-dictionary join (``functions/linking.py``) produces those edges
for EXACT alias hits; this module is the scalable candidate generator
for everything else: entities whose *names* share rare tokens are
candidate matches, scored by token rarity, and the surviving pairs
feed the same CC canonicalization.

Shape at scale (the classic inverted-index discipline):

- token production is row-local (split inside the scan stage);
- the block index is ONE groupBy(token) count — map-side partial;
- **blocks are size-capped** (``max_block``): a token shared by more
  entities than the cap is stop-text ("protein", "strain") and is
  dropped BEFORE the self-join — the quadratic term is bounded by
  C(max_block, 2) per block, so no hub token can explode a reducer
  (MinoanER's block purging, same role as ``max_doc_freq`` in
  ``dedup.ngram_jaccard_pairs``);
- pair scoring is rarity-weighted: shared token t contributes
  ``ln(N / df_t)`` (its IDF), summed per pair — one map-side-partial
  groupBy on (a, b);
- output is O(candidate pairs), never O(entities²).

Float protocol: per-token IDF is pinned to micro-units with
``floor(x·1e6 + 0.5)`` and summed as BIGINT (the integer protocol of
``ngram_lm.py``) — exact across engines except the measure-zero
ln-ulp boundary (documented there).

Reference parity: the reference merges rows whose ``id`` strings are
already equal (utils/duckdb_utils.py:356-359) — it has no fuzzy/ER
capability; this is the distributed upgrade the north rule's
"cross-source ID reconciliation" requires when sources disagree on
identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.text import normalized_text


def name_tokens(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    min_token_len: int = 2,
) -> DataFrame:
    """Row-local: distinct (id, token) postings from entity names."""
    toks = F.filter(
        F.split(normalized_text(F.col(name_col)), " "),
        lambda t: F.length(t) >= min_token_len,
    )
    return (
        df.select(F.col(id_col).alias("_eid"), F.explode(toks).alias("token"))
        .distinct()
    )


def token_blocking_candidates(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_block: int = 50,
    min_shared: int = 1,
    min_token_len: int = 2,
) -> DataFrame:
    """Candidate same-entity pairs: (id_a, id_b, shared BIGINT,
    score DOUBLE) with id_a < id_b, scored by summed token IDF
    (rarer shared tokens → higher score). Tokens in more than
    ``max_block`` entities are purged before pairing (stop-text is
    the quadratic term); singleton blocks pair nothing."""
    from pyspark.sql import Window

    posts = name_tokens(
        df, id_col=id_col, name_col=name_col, min_token_len=min_token_len
    )
    n_entities = df.select(id_col).distinct().count()
    # block size as a window over the posting stream (not groupBy+join):
    # the purge filter then sits on the ONE plan both self-join sides
    # share, so ReuseExchange materializes the postings once
    sized = posts.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    ).filter((F.col("df") >= 2) & (F.col("df") <= max_block))
    # per-token IDF in exact micro-units (integer protocol)
    idf_micro = F.floor(
        F.log(F.lit(float(n_entities)) / F.col("df")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    kept = sized.select("token", "_eid", idf_micro.alias("idf_micro"))

    a = kept.select(
        "token", F.col("_eid").alias("id_a"), "idf_micro"
    )
    b = kept.select("token", F.col("_eid").alias("id_b"))
    pairs = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.sum("idf_micro").alias("score_micro"),
        )
        .filter(F.col("shared") >= min_shared)
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("shared").cast("bigint").alias("shared"),
        (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
    )


def same_as_edges(
    candidates: DataFrame, min_score: float
) -> DataFrame:
    """Threshold candidates into same_as edges for
    ``operators/components.connected_components`` (columns subject,
    object — the repo's same_as edge shape)."""
    return candidates.filter(F.col("score") >= min_score).select(
        F.col("id_a").alias("subject"), F.col("id_b").alias("object")
    )
