"""Distributed k-core decomposition over a KG edge DataFrame.

The k-core is the maximal subgraph in which every node has degree ≥ k —
the standard graph-quality filter: peeling a merged KG to its 2-core
strips dangling leaf chains (provenance stubs, singleton attributes)
while keeping the densely-connected entity clusters that carry the
graph's signal; higher k isolates hub cores for skew planning. The
reference has no subgraph-mining operator; this is the classic
iterative-peeling algorithm (Matula & Beck 1983) expressed as DataFrame
rounds, the same shape as operators/components.py.

Algorithm: repeat { compute degrees; drop nodes with deg < k; keep only
edges with both endpoints surviving } until the edge set is stable. Each
round removes at least one node or terminates, and in practice web
graphs converge in a few rounds (peeling depth, not diameter).

Scale notes
-----------
* Each round is one degree aggregation (map-side partial ``count``) and
  two semi-joins of the edge list against the surviving-node set — all
  equi-joins on node ids; AQE splits residual hub skew. Nothing ever
  materializes an adjacency list.
* Eager ``localCheckpoint`` per round truncates lineage (same rationale
  as components.py — on a real cluster use reliable ``checkpoint``).
* Convergence = order-insensitive edge-multiset checksum (count +
  bit_xor of xxhash64), one aggregation per round, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected_simple(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected simple edges ``(a, b)`` with a < b (self-loops
    dropped — a self-loop adds no peeling-resistant degree)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )


def kcore_edges(
    edges: DataFrame,
    k: int,
    src: str = "subject",
    dst: str = "object",
    max_iterations: int = 50,
) -> DataFrame:
    """Edges ``(a, b)`` (a < b, undirected-simple) of the k-core."""
    e = _undirected_simple(edges, src, dst)
    prev = None
    for _ in range(max_iterations):
        keep = _degrees(e).filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
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
    return e


def kcore_nodes(
    edges: DataFrame,
    k: int,
    src: str = "subject",
    dst: str = "object",
    max_iterations: int = 50,
) -> DataFrame:
    """Nodes of the k-core with their within-core degree:
    ``(id, core_degree)``."""
    e = kcore_edges(edges, k, src, dst, max_iterations)
    return _degrees(e).select(
        F.col("node").alias("id"), F.col("deg").alias("core_degree")
    )
