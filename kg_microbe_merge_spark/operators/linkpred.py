"""Neighborhood-overlap link prediction over a KG edge DataFrame:
common-neighbor counts, Adamic-Adar, and neighborhood Jaccard for
2-hop node pairs — the standard KG-completion candidate scorer (which
missing edges should exist?) and the graph-side complement of the
embedding ANN family (:mod:`.similarity`).

Algorithm: one wedge self-join through the shared neighbor ``z``
(exactly the :mod:`.triangles` join shape), then a per-pair partial
aggregation:

    common(a, b)      = |N(a) ∩ N(b)|
    adamic_adar(a, b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z))
    jaccard(a, b)     = common / (deg(a) + deg(b) - common)

Already-connected pairs are removed with an anti join (predicting an
existing edge is useless), so every output row is a genuine 2-hop
candidate.

Scale design:

* The wedge join fans out deg(z)² pairs per center — the same hub
  curse as triangle counting. ``max_center_degree`` (default 10 000)
  drops hub centers BEFORE the self-join: principled, not just
  pragmatic — a z with deg 10⁶ contributes only 1/ln(10⁶) ≈ 0.07 to
  Adamic-Adar while minting 10¹² candidate pairs, so capping removes
  ~zero signal and bounds the join at deg_cap × |E| rows. (Set None
  to disable on small graphs.)
* Adamic-Adar terms cross the shuffle as EXACT integers
  (``floor(1e6/ln(deg) + 0.5)`` micro-units, the repo protocol), so
  the per-pair sum is order-independent — bit-identical across
  engines and partitionings; the division back to a double happens
  once per output row.
* Both aggregations are map-side combinable; degrees join back via
  two (small, O(nodes)) joins that AQE broadcasts when they fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1000000.0


def link_prediction_scores(
    edges: DataFrame,
    src: str = "subject",
    dst: str = "object",
    max_center_degree: int | None = 10_000,
    min_common: int = 1,
) -> DataFrame:
    """``(node_a, node_b, common, adamic_adar, jaccard)`` for every
    non-adjacent pair with ≥ ``min_common`` shared neighbors
    (``node_a < node_b``; scores pinned to 6 decimals via the integer
    micro protocol)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = und.select(
        F.col("a").alias("z"), F.col("b").alias("x")
    ).union(und.select(F.col("b").alias("z"), F.col("a").alias("x")))
    deg = nbrs.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))

    centers = nbrs.join(deg, "z")
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    # exact integer Adamic-Adar contribution of this center; a degree-1
    # center can never close a wedge, but guard ln(1)=0 anyway so the
    # expression stays finite on every row (both engines)
    centers = centers.withColumn(
        "aa_micro",
        F.when(
            F.col("deg") >= 2,
            F.floor(
                F.lit(MICRO) / F.log(F.col("deg").cast("double"))
                + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )

    left = centers.select("z", F.col("x").alias("node_a"), "aa_micro")
    right = centers.select("z", F.col("x").alias("node_b"))
    pairs = (
        left.join(right, "z")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum("aa_micro").alias("aa_sum"),
        )
        .filter(F.col("common") >= min_common)
    )
    # drop already-connected pairs
    pairs = pairs.join(
        und.select(
            F.col("a").alias("node_a"), F.col("b").alias("node_b")
        ),
        ["node_a", "node_b"],
        "left_anti",
    )
    da = deg.select(F.col("z").alias("node_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("z").alias("node_b"), F.col("deg").alias("_db"))
    out = pairs.join(da, "node_a").join(db, "node_b")
    jac = F.col("common").cast("double") / (
        F.col("_da") + F.col("_db") - F.col("common")
    ).cast("double")
    return out.select(
        "node_a",
        "node_b",
        "common",
        (F.col("aa_sum").cast("double") / F.lit(MICRO)).alias("adamic_adar"),
        (
            F.floor(jac * F.lit(MICRO) + F.lit(0.5)).cast("bigint")
            / F.lit(MICRO)
        ).alias("jaccard"),
    )


def ranking_metrics(
    scored: DataFrame,
    truth: DataFrame,
    hits_at: tuple = (1, 3, 10),
    query_col: str = "query",
    cand_col: str = "candidate",
    score_col: str = "score_micro",
) -> DataFrame:
    """Per-query ranking evaluation for link prediction / entity
    linking / retrieval: ``(query, rank, rr_micro, hits_1, hits_3,
    hits_10)`` where ``rank`` is the true candidate's position under
    the DETERMINISTIC total order (score desc, candidate asc) and
    ``rr_micro = floor(1e6/rank + 0.5)`` (the repo's integer
    reciprocal-rank protocol — MRR is then a mean of exact BIGINTs).

    ``scored``: (query, candidate, score_micro BIGINT) — integer
    scores by contract (micro-scale upstream; ties then break
    identically in every engine). ``truth``: (query, candidate) with
    one true candidate per query. Queries whose true candidate is
    absent from ``scored`` produce no row (the caller decides whether
    absence means rank ∞ — report coverage separately). The filtered
    protocol is the CALLER's duty: drop known-true candidates from
    ``scored`` first (see :func:`..negatives.corrupt_triples`).

    Scale: rank is computed WITHOUT a window — one equi-join pulls the
    true candidate's score per query, one map-side-combinable count
    aggregation counts strictly-better rows. Shuffles on query only;
    candidate lists never sort."""
    s = scored.select(
        F.col(query_col).alias("q"),
        F.col(cand_col).alias("c"),
        F.col(score_col).cast("long").alias("sc"),
    )
    t = truth.select(
        F.col(query_col).alias("q"), F.col(cand_col).alias("tc")
    )
    true_scores = s.join(t, "q").filter(F.col("c") == F.col("tc")).select(
        "q", F.col("tc"), F.col("sc").alias("tsc")
    )
    better = (
        s.join(true_scores, "q")
        .filter(
            (F.col("sc") > F.col("tsc"))
            | ((F.col("sc") == F.col("tsc")) & (F.col("c") < F.col("tc")))
        )
        .groupBy("q")
        .agg(F.count("*").alias("_nb"))
    )
    ranked = (
        true_scores.join(better, "q", "left")
        .select(
            F.col("q").alias("query"),
            (F.coalesce(F.col("_nb"), F.lit(0)) + 1).alias("rank"),
        )
    )
    rank = F.col("rank")
    out = ranked.select(
        "query",
        "rank",
        F.floor((F.lit(2_000_000) + rank) / (rank * 2))
        .cast("bigint")
        .alias("rr_micro"),
        *[
            (rank <= k).cast("int").alias(f"hits_{k}")
            for k in hits_at
        ],
    )
    return out


def ranking_metrics_sql(
    scored_cte: str,
    truth_cte: str,
    hits_at: tuple = (1, 3, 10),
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`ranking_metrics` over CTEs providing
    (query, candidate, score_micro) and (query, candidate);
    ``prelude_ctes`` lets callers define those CTEs in the same WITH
    block."""
    hits = ",\n               ".join(
        f"CAST(rank <= {k} AS INT) AS hits_{k}" for k in hits_at
    )
    return f"""
        WITH {prelude_ctes}
        ts AS (
            SELECT s.query AS q, s.candidate AS tc,
                   s.score_micro AS tsc
            FROM {scored_cte} s JOIN {truth_cte} t
            ON s.query = t.query AND s.candidate = t.candidate),
        nb AS (
            SELECT ts.q, count(*) AS n
            FROM {scored_cte} s JOIN ts ON s.query = ts.q
            WHERE s.score_micro > ts.tsc
            OR (s.score_micro = ts.tsc AND s.candidate < ts.tc)
            GROUP BY ts.q),
        ranked AS (
            SELECT ts.q AS query,
                   1 + coalesce(nb.n, 0) AS rank
            FROM ts LEFT JOIN nb ON ts.q = nb.q)
        SELECT query, rank,
               CAST(floor((2000000 + rank) / (rank * 2.0)) AS BIGINT)
                   AS rr_micro,
               {hits}
        FROM ranked
    """
