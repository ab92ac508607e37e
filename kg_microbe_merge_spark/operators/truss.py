"""Distributed k-truss decomposition over a KG edge DataFrame.

The k-truss is the maximal subgraph in which every edge participates in
at least ``k - 2`` triangles (its *support*) — the edge-granular
sibling of the k-core (operators/kcore.py) and a strictly stronger
cohesion filter: a k-core keeps any node with enough neighbors, a
k-truss keeps only edges embedded in dense triangle tissue. On a merged
KG it isolates the cliquish entity clusters (over-merge bursts, true
communities) while cutting bridge edges that a bad same-as link minted —
exactly the edges k-core peeling cannot see, because their *endpoints*
stay high-degree. The reference has no subgraph-mining operator; this is
the standard support-peeling algorithm (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis") expressed as DataFrame rounds.

Algorithm: repeat { count per-edge triangle support via the
degree-oriented wedge join (operators/triangles.py — Suri &
Vassilvitskii's bound keeps hub wedge fan-out O(sqrt(m))); drop edges
with support < k-2 } until the edge multiset is stable. Support is
non-increasing as edges leave, so peeling is a monotone fixpoint.

Scale notes
-----------
* Per round: one degree aggregation, the oriented wedge self-join, the
  closing-edge join, one support aggregation (map-side partial
  ``count``), and one left join to filter — all equi-joins on ids; AQE
  splits residual hub skew. No adjacency list is ever materialized.
* Triangles explode to exactly 3 canonical edge rows each before the
  support count, so the support shuffle carries (a, b, 1)-shaped rows,
  partially aggregated map-side.
* Eager ``localCheckpoint`` per round truncates lineage (swap for
  reliable ``checkpoint`` on a real cluster, as in components.py).
* Convergence = order-insensitive edge-multiset checksum (count +
  ``bit_xor(xxhash64)``), one aggregation per round, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.kcore import _undirected_simple
from kg_microbe_merge_spark.operators.triangles import triangles


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle counts ``(a, b, support)`` over the canonical
    edge set ``e`` — every triangle (u, v, w) credits its 3 edges once.
    Edges in no triangle get no row (callers coalesce to 0)."""
    t = triangles(e, src="a", dst="b")
    sides = (
        t.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .union(t.select(F.col("u").alias("x"), F.col("w").alias("y")))
        .union(t.select(F.col("v").alias("x"), F.col("w").alias("y")))
    )
    return (
        sides.select(
            F.least(F.col("x"), F.col("y")).alias("a"),
            F.greatest(F.col("x"), F.col("y")).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("support"))
    )


def ktruss_edges(
    edges: DataFrame,
    k: int,
    src: str = "subject",
    dst: str = "object",
    max_iterations: int = 50,
) -> DataFrame:
    """Edges of the k-truss with their within-truss triangle support:
    ``(a, b, support)`` where a < b on the undirected simple graph and
    ``support`` ≥ k-2 is the edge's triangle count inside the truss.

    ``k`` must be ≥ 3 (k=3 keeps every edge in at least one triangle;
    k=2 would be the identity and is rejected to avoid masking bugs).
    """
    if k < 3:
        raise ValueError(f"k-truss requires k >= 3, got k={k}")
    e = _undirected_simple(edges, src, dst)
    # standard pre-shrink: every k-truss node has within-truss degree
    # ≥ k-1, so truss edges ⊆ (k-1)-core edges — and core peeling is
    # cheap degree rounds (no wedge joins), so the expensive support
    # rounds below start from the already-stripped graph (tree/leaf
    # regions never reach a triangle enumeration)
    from kg_microbe_merge_spark.operators.kcore import kcore_edges

    e = kcore_edges(e, k - 1, src="a", dst="b",
                    max_iterations=max_iterations)
    prev = None
    for _ in range(max_iterations):
        sup = _edge_support(e)
        e = (
            e.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
        )
        # lazy: the checksum action below materializes the checkpoint
        # (one job per round instead of two — the components.py A/B)
        e = e.localCheckpoint(eager=False)
        row = e.select(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        checksum = (row["n"], row["h"])
        if checksum == prev or row["n"] == 0:
            break
        prev = checksum
    # final within-truss support (stable by the fixpoint, recomputed so
    # the output carries it without threading state through the loop)
    sup = _edge_support(e)
    return e.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"),
    )


def ktruss_nodes(
    edges: DataFrame,
    k: int,
    src: str = "subject",
    dst: str = "object",
    max_iterations: int = 50,
) -> DataFrame:
    """Nodes of the k-truss with their within-truss degree:
    ``(id, truss_degree)``."""
    e = ktruss_edges(edges, k, src, dst, max_iterations)
    return (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("truss_degree"))
    )
