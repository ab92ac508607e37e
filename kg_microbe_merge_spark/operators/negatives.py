"""Deterministic negative sampling from a unigram^power distribution.

The word2vec/DeepWalk training-data step downstream of
``operators/walks.skipgram_pairs`` / ``operators/vocab``: every
(positive-pair, draw-index) gets a negative example drawn from the
smoothed unigram distribution P(w) ∝ count(w)^power (power = 0.75 in
Mikolov et al.) — here as a pure function of the pair, so the sampled
corpus is reproducible across runs, partitionings and engines.

Architecture at 100 TB:

* the vocabulary is a DIMENSION (≤ tens of millions of rows next to
  trillions of pairs), so its CDF is built once, collected sorted, and
  shipped to executors inside the UDF closure — the same
  broadcast-small-side discipline as the entity-linking dict and the
  IVF centroids;
* the draw itself is row-local: the 60-bit portable hash of
  (pair, draw index) mod total maps into the CDF via a vectorized
  ``np.searchsorted`` inside an Arrow-batched pandas UDF — ZERO
  additional shuffle beyond whatever produced the pairs (plan-asserted
  in tests), O(log V) per draw;
* integer protocol end-to-end: micro-weights
  ``floor(n^power · 2^20 + 0.5)`` with ``n^0.75`` computed as
  ``sqrt(n) · sqrt(sqrt(n))`` (IEEE-exact sqrts, one correctly-rounded
  multiply — the identical expression tree in Spark, DuckDB and
  numpy), BIGINT cumulative sums, integer modulo — so the driver's
  DuckDB gate verifies every sampled word value-for-value with a
  range join against the same CDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.hashing import hash60
from .mixing import power_micro as _power_micro  # ONE protocol definition


class UnigramCDF:
    """Sorted-by-word cumulative micro-weight table (the sampling
    dimension). ``words[i]`` owns the draw interval
    ``[hi[i] - w[i], hi[i])``."""

    def __init__(self, words: list[str], micro: list[int]):
        if not words:
            raise ValueError("empty vocabulary")
        self.words = np.asarray(words, dtype=object)
        cum, acc = [], 0
        for m in micro:
            acc += m
            cum.append(acc)
        if acc <= 0:
            raise ValueError("all micro-weights are zero")
        if acc > (1 << 62):
            raise ValueError(
                f"CDF total {acc} exceeds 2^62 — lower the weight scale"
            )
        self.hi = np.asarray(cum, dtype=np.int64)
        self.total = acc

    def pick(self, u: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.hi, u, side="right")
        return self.words[idx]


def unigram_cdf(
    vocab_counts: DataFrame,
    word_col: str = "token",
    count_col: str = "n",
    power: float = 0.75,
) -> UnigramCDF:
    """Build the sampling CDF from a distributed ``(word, count)``
    table. The collect is vocabulary-sized (a dimension, not the
    corpus); rows are taken sorted by word so the cumulative layout —
    and therefore every sampled value — is independent of upstream
    partitioning."""
    rows = (
        vocab_counts.select(word_col, count_col)
        .orderBy(F.asc(word_col))
        .collect()
    )
    return UnigramCDF(
        [r[0] for r in rows], [_power_micro(r[1], power) for r in rows]
    )


def negative_samples(
    pairs: DataFrame,
    cdf: UnigramCDF,
    k: int = 2,
    a_col: str = "lhs",
    b_col: str = "rhs",
    salt: str = "neg",
    out_col: str = "negative",
) -> DataFrame:
    """Attach ``k`` deterministic negative draws to every positive
    pair: row (a, b) gets draws j = 1..k with
    ``u_j = hash60(a:b:j:salt) mod total`` mapped through the CDF.

    No accidental-positive exclusion (the standard simplification —
    with a real vocabulary the collision odds per draw are the pair's
    own unigram mass); filter ``negative != b`` afterwards if the
    training recipe requires it, accepting the count shortfall.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    words, hi = cdf.words, cdf.hi

    @pandas_udf("string")
    def _pick(u):
        import pandas as pd

        idx = np.searchsorted(hi, u.values, side="right")
        return pd.Series(words[idx])

    drawn = pairs.withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.lit(k)))
    ).withColumn(
        "_u",
        hash60(
            F.concat_ws(
                ":", F.col(a_col), F.col(b_col), F.col("j"), F.lit(salt)
            )
        )
        % F.lit(cdf.total),
    )
    return drawn.withColumn(out_col, _pick(F.col("_u"))).drop("_u")


def corrupt_triples(
    triples: DataFrame,
    k: int = 2,
    corrupt: str = "object",
    salt: str = "corrupt",
) -> DataFrame:
    """KG-embedding training negatives: for every positive
    (subject, predicate, object) and draw index j ∈ [0, k), corrupt
    one end with a deterministic draw from the SAME predicate's
    observed entity pool — the type-consistent ("constrained")
    corruption protocol of the TransE family, filtered: draws that
    reproduce the positive's own end or collide with ANY true triple
    are dropped (so a positive can yield < k rows — the standard
    filtered setting; the (j) column says which draws survived).

    Output: (subject, predicate, object, j, negative) where
    ``negative`` replaces the corrupted end.

    100 TB shape: the per-predicate pool is DISTINCT observed ends —
    entity-dimension-sized (the vocab-CDF class), never the triple
    count. Pool members get dense per-predicate indices by ONE
    predicate-partitioned row_number window (bounded by the dimension,
    same justification as the CDF collect); pool sizes broadcast (one
    row per predicate); each draw is a row-local
    ``hash60(s,p,o,j,salt) mod pool_size`` and ONE equi-join on
    (predicate, idx) — the draw key spreads across idx, so hub
    predicates fan out instead of hot-keying. The true-triple filter
    is one anti join on the corrupted triple."""
    if corrupt not in ("object", "subject"):
        raise ValueError(f"corrupt must be 'object' or 'subject': {corrupt}")
    end = corrupt
    t = triples.select("subject", "predicate", "object")
    pool = (
        t.select("predicate", F.col(end).alias("_cand"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("predicate").orderBy("_cand")
    pool_idx = pool.select(
        "predicate", "_cand", (F.row_number().over(w) - 1).alias("_idx")
    )
    sizes = pool_idx.groupBy("predicate").agg(
        (F.max("_idx") + 1).alias("_n")
    )
    draws = (
        t.join(F.broadcast(sizes), "predicate")
        .select(
            "subject",
            "predicate",
            "object",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
            F.col("_n"),
        )
        .withColumn(
            "_idx",
            F.pmod(
                hash60(
                    F.concat_ws(
                        ":",
                        F.col("subject"),
                        F.col("predicate"),
                        F.col("object"),
                        F.col("j").cast("string"),
                        F.lit(salt),
                    )
                ),
                F.col("_n"),
            ),
        )
    )
    cand = draws.join(pool_idx, ["predicate", "_idx"]).select(
        "subject", "predicate", "object", "j",
        F.col("_cand").alias("negative"),
    )
    cand = cand.filter(F.col("negative") != F.col(end))
    other = "object" if end == "subject" else "subject"
    true_key = (
        t.select(
            F.col(other).alias("_o"),
            "predicate",
            F.col(end).alias("negative"),
        )
        .withColumnRenamed("_o", other)
    )
    return cand.join(
        true_key, [other, "predicate", "negative"], "left_anti"
    ).select("subject", "predicate", "object", "j", "negative")


def corrupt_triples_sql(
    triples_cte: str,
    k: int,
    corrupt: str = "object",
    salt: str = "corrupt",
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`corrupt_triples` over a CTE providing
    (subject, predicate, object); ``prelude_ctes`` (e.g.
    ``"tr AS (...),"``) lets callers define that CTE in the same
    WITH block."""
    end = corrupt
    other = "object" if end == "subject" else "subject"
    from ..functions.hashing import hash60_sql

    h = hash60_sql(
        "t.subject || ':' || t.predicate || ':' || t.object || ':' "
        f"|| j::VARCHAR || ':{salt}'"
    )
    return f"""
        WITH {prelude_ctes}
        pool AS (
            SELECT DISTINCT predicate, {end} AS cand FROM {triples_cte}),
        pool_idx AS (
            SELECT predicate, cand,
                   row_number() OVER (PARTITION BY predicate ORDER BY cand) - 1 AS idx
            FROM pool),
        sizes AS (
            SELECT predicate, count(*) AS n FROM pool GROUP BY predicate),
        draws AS (
            SELECT t.subject, t.predicate, t.object, j,
                   {h} % s.n AS idx
            FROM {triples_cte} t
            JOIN sizes s ON t.predicate = s.predicate
            CROSS JOIN (SELECT unnest(range({k})) AS j)),
        cand AS (
            SELECT d.subject, d.predicate, d.object, d.j,
                   p.cand AS negative
            FROM draws d
            JOIN pool_idx p ON d.predicate = p.predicate AND d.idx = p.idx
            WHERE p.cand <> d.{end})
        SELECT c.subject, c.predicate, c.object, CAST(c.j AS INT) AS j,
               c.negative
        FROM cand c
        ANTI JOIN {triples_cte} x
        ON c.{other} = x.{other} AND c.predicate = x.predicate
        AND c.negative = x.{end}
    """
