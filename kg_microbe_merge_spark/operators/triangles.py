"""Distributed triangle counting over a KG edge DataFrame.

Triangle (3-clique) statistics drive KG quality analysis — clustering
coefficients, motif density, spotting over-merged entity clusters (an
over-merge from a bad same-as edge shows up as a dense triangle burst
around the merged id). The reference has no graph-motif operator; this
is the standard MapReduce-era degree-orientation algorithm (Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW'11) expressed as DataFrame joins.

Scale notes
-----------
* The naive wedge enumeration explodes on hubs: a degree-d node yields
  d² wedge candidates, and web-scale KGs have d ~ 10⁸ hubs. Orienting
  every edge from the (degree, id)-SMALLER endpoint to the LARGER one
  bounds every out-degree by O(sqrt(m)) — each wedge center now does
  out-deg² work with out-deg ≤ sqrt(2m), killing the last-reducer curse
  (the "curse" paper's exact fix).
* Three shuffles total: degree aggregation, wedge self-join on the
  oriented center, and the closing-edge join; all equi-joins on ids —
  AQE handles residual skew.
* Per-node counts explode each triangle to its 3 corners and partially
  aggregate map-side; the global count is ``sum(triangles)/3``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrize/dedup to undirected simple edges, then orient each
    from the (degree, id)-smaller endpoint to the larger: ``(lo, hi)``
    where nodes compare by struct(degree, id)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    j = und.join(da, "a").join(db, "b")
    ka = F.struct(F.col("_da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("_db").alias("d"), F.col("b").alias("n"))
    return j.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(ka < kb, kb).otherwise(ka).alias("_khi"),
    )


def triangles(
    edges: DataFrame, src: str = "subject", dst: str = "object"
) -> DataFrame:
    """Enumerate each triangle once as ``(u, v, w)`` rows (corner order
    follows the degree orientation — u is the wedge center)."""
    o = _oriented_edges(edges, src, dst)
    e1 = o.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("_khi").alias("_kv")
    )
    e2 = o.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("_khi").alias("_kw")
    )
    # each unordered out-neighbor pair once: order by the orientation key
    wedges = e1.join(e2, "u").filter(F.col("_kv") < F.col("_kw"))
    closing = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    return wedges.join(closing, ["v", "w"]).select("u", "v", "w")


def triangle_counts(
    edges: DataFrame, src: str = "subject", dst: str = "object"
) -> DataFrame:
    """Per-node triangle participation counts ``(id, triangles)`` for
    every node in at least one triangle."""
    t = triangles(edges, src, dst)
    corners = (
        t.select(F.col("u").alias("id"))
        .union(t.select(F.col("v").alias("id")))
        .union(t.select(F.col("w").alias("id")))
    )
    return corners.groupBy("id").agg(
        F.count("*").cast("long").alias("triangles")
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "subject", dst: str = "object"
) -> DataFrame:
    """Local clustering coefficient per node:
    ``(id, degree, triangles, coeff)`` where
    ``coeff = 2·triangles / (degree·(degree-1))`` on the undirected
    simple graph (0.0 for degree < 2) — the standard motif-density
    signal for over-merged entity clusters (a bad same-as fuse shows
    up as a dense high-coefficient burst around the merged id).

    Composite of the verified pieces: degrees come from one partial
    aggregation over the deduped undirected edges, triangle counts
    from the degree-oriented wedge join; one left join (triangle-free
    nodes get 0). The ratio is pinned with the floor(x·1e6+0.5)
    cross-engine protocol.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    tri = triangle_counts(edges, src, dst)
    joined = deg.join(tri, "id", "left").select(
        "id",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
            "triangles"
        ),
    )
    denom = F.col("degree") * (F.col("degree") - 1)
    coeff = F.when(
        F.col("degree") >= 2,
        F.floor(
            (F.lit(2.0) * F.col("triangles").cast("double"))
            / denom.cast("double")
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint")
        / F.lit(1000000.0),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("coeff", coeff)
