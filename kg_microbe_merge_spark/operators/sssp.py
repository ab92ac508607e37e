"""Weighted single-source(-set) shortest paths over a KG edge
DataFrame — frontier Bellman-Ford relaxation.

:mod:`.bfs` answers "within k hops"; ontology and curation queries
also need WEIGHTED distance — edge costs from confidence scores,
semantic distance (1/similarity), or hop costs per predicate class.
This is the weighted twin of the BFS frontier loop: per round, relax
every edge leaving the improved frontier, keep per-node minima, and
merge into the running distance table. Stops at the first round with
no improvement (then the result is the TRUE shortest-path distance for
every reached node, for non-negative weights) or after ``max_hops``
rounds (then it is the exact "shortest path using ≤ max_hops edges"
distance — still well-defined, and what the bounded recursive-CTE
oracle computes; negative weights are accepted under the bounded
semantics, where the hop cap plays Bellman-Ford's n-1 bound).

Scale notes
-----------
* Per round: ONE equi-join of the frontier against the persisted edge
  relation (shuffle O(frontier·out-degree), never O(graph)), one
  map-side-combinable min aggregation, one outer merge with the
  distance table keyed on id. The edge relation is partitioned once
  and reused by every round.
* The distance table and frontier are ``localCheckpoint``-ed per round
  (lineage truncation + shared materialization between the emptiness
  check and the next join — the operators/components discipline; swap
  for reliable ``checkpoint`` on a real cluster).
* Improvement-only frontier: a node re-enters the frontier ONLY when
  its distance improved this round, so dense regions stop generating
  work as soon as they stabilize (the frontier shrinks like delta-
  stepping's light buckets, without the bucket machinery).
* Hub skew: a hub's out-edges relax across many DISTINCT dst keys, so
  the min-agg shuffle spreads; only the frontier-join side keys on the
  hub id itself — AQE skew-join covers the residual.
* Weights ride as 64-bit integers end-to-end (micro-scale float costs
  upstream if needed — the repo's integer protocol), so min() is exact
  and the DuckDB twin hashes identical BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "subject",
    dst: str = "object",
    weight: str = "weight",
    directed: bool = True,
    with_predecessor: bool = False,
) -> DataFrame:
    """Return ``(id, dist)``: minimum total edge weight from any node
    in ``sources`` (1-column DataFrame of ids) to every node reachable
    within ``max_hops`` edges. Source nodes appear with dist 0. NULL
    endpoints/weights are dropped.

    ``with_predecessor=True`` adds a ``pred`` column — an optimal
    previous node on a shortest path, derived POST-HOC from the final
    distance table: ``pred(v) = min{ p : dist(p) + w(p,v) = dist(v) }``
    (one extra edges⋈dist⋈dist join + a min agg — round structure
    untouched). The min-id tie-break makes reconstruction
    deterministic cross-engine; walking ``pred`` links backwards
    always descends ``dist``, so it reaches a source in ≤ max_hops
    steps. Sources have NULL pred unless a zero-total-weight path
    enters them (then that optimal predecessor is reported — it is
    one). Under the hop-BOUNDED semantics (stopped at max_hops before
    convergence) a reported pred may sit on a path longer than the
    bound — the equation above is the documented contract either
    way."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src).alias("_s"),
        F.col(dst).alias("_d"),
        F.col(weight).cast("long").alias("_w"),
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_d").isNotNull()
        & F.col("_w").isNotNull()
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("_d").alias("_s"),
                F.col("_s").alias("_d"),
                F.col("_w"),
            )
        )
    # parallel edges collapse to their cheapest copy before any round
    e = e.groupBy("_s", "_d").agg(F.min("_w").alias("_w")).persist()

    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .select("id", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    try:
        for _ in range(max_hops):
            cand = (
                frontier.join(e, frontier["id"] == e["_s"])
                .groupBy(F.col("_d").alias("id"))
                .agg(F.min(F.col("dist") + F.col("_w")).alias("_nd"))
            )
            improved = (
                cand.join(dist, "id", "left")
                .filter(F.col("dist").isNull() | (F.col("_nd") < F.col("dist")))
                .select("id", F.col("_nd").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if improved.limit(1).count() == 0:
                break
            dist = (
                dist.join(improved.withColumnRenamed("dist", "_i"), "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce("dist", F.col("_i")),
                        F.coalesce(F.col("_i"), F.col("dist")),
                    ).alias("dist"),
                )
                .localCheckpoint(eager=True)
            )
            frontier = improved
        if with_predecessor:
            dp = dist.select(
                F.col("id").alias("_p"), F.col("dist").alias("_pd")
            )
            dv = dist.select(
                F.col("id").alias("_v"), F.col("dist").alias("_vd")
            )
            preds = (
                e.join(dp, e["_s"] == dp["_p"])
                .join(
                    dv,
                    (F.col("_d") == dv["_v"])
                    & (F.col("_pd") + F.col("_w") == dv["_vd"]),
                )
                .groupBy(F.col("_v").alias("id"))
                .agg(F.min("_p").alias("pred"))
            )
            dist = dist.join(preds, "id", "left")
    finally:
        e.unpersist()
    return dist


def sssp_sql(
    edges_cte: str, sources_cte: str, max_hops: int
) -> str:
    """DuckDB twin: bounded recursive walk enumeration with UNION
    dedup on (node, dist, hops), then the per-node minimum — an
    INDEPENDENT derivation (path enumeration vs frontier relaxation).
    ``edges_cte`` provides (s, d, w), ``sources_cte`` (id). Embed after
    ``WITH RECURSIVE``; select from ``sssp_result``."""
    return f"""
        walk(node, dist, hops) AS (
            SELECT id, CAST(0 AS BIGINT), 0 FROM {sources_cte}
            UNION
            SELECT e.d, walk.dist + e.w, walk.hops + 1
            FROM walk JOIN {edges_cte} e ON walk.node = e.s
            WHERE walk.hops < {max_hops}),
        sssp_result AS (
            SELECT node AS id, min(dist) AS dist
            FROM walk GROUP BY node)
    """


def sssp_pred_sql(edges_cte: str) -> str:
    """Predecessor twin: appends a ``sssp_pred`` CTE after
    :func:`sssp_sql`'s CTEs — ``pred(v) = min p with dist(p) + w = dist(v)``
    over the RAW edge list (a heavier parallel edge can never satisfy
    the optimality equation, so collapsing to min weight first — as
    the engine does — changes nothing). Select
    ``r.id, r.dist, p.pred`` via LEFT JOIN for the full result."""
    return f"""
        sssp_pred AS (
            SELECT r2.id AS id, min(e.s) AS pred
            FROM {edges_cte} e
            JOIN sssp_result r1 ON e.s = r1.id
            JOIN sssp_result r2 ON e.d = r2.id
            AND r1.dist + e.w = r2.dist
            GROUP BY r2.id)
    """
