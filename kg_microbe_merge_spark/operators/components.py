"""Distributed connected components over a ``same_as`` edge DataFrame.

Implements the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14),
as pure DataFrame joins/aggregations — no GraphX/GraphFrames dependency.
This replaces the reference's in-memory whole-graph merge
(kg_microbe_merge/merge.py:50-60 delegating to kgx/networkx): cross-source
ID reconciliation becomes label propagation that converges in
O(log^2 n) rounds regardless of component diameter, so a 10^12-node
graph with a continent-sized component still terminates.

Scale notes
-----------
* Each round is two shuffles (groupBy min-neighbor + re-emit edges);
  AQE handles the heavy skew of hub nodes (a hub's neighbor list is
  aggregated with ``min``, which is partially aggregable map-side —
  no reducer ever materializes the full adjacency list).
* Eager ``localCheckpoint`` EVERY round truncates lineage so the plan
  doesn't grow unboundedly and guarantees the convergence-check action
  and the next round share one materialization (on a real cluster use
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint`` for
  fault-tolerant truncation).
* Convergence check is a single ``count`` of changed labels per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrize, drop self-loops, dedup."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return sym.filter(F.col("src") != F.col("dst")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: emit both orientations, group by u, and connect
    every strictly-larger neighbor v > u to m = min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = m.select("src", F.least(F.col("_mn"), F.col("src")).alias("mn"))
    big = sym.filter(F.col("dst") > F.col("src"))
    return (
        big.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient each edge (max, min), group by u over its
    smaller neighbors N⁻(u), m = min(N⁻(u)); connect every v ∈
    N⁻(u) ∪ {u} except m to m."""
    le = e.select(
        F.greatest(F.col("src"), F.col("dst")).alias("src"),
        F.least(F.col("src"), F.col("dst")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    m = le.groupBy("src").agg(F.min("dst").alias("mn"))
    nbrs = le.join(m, "src").select(
        F.col("dst").alias("src"), F.col("mn").alias("dst")
    )
    selfe = m.select(F.col("src"), F.col("mn").alias("dst"))
    return (
        nbrs.union(selfe)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum
    node id in each connected component.

    Works for any orderable node type (string CURIEs included — min is
    lexicographic, which is all canonicalization needs: a stable,
    deterministic representative).
    """
    # node universe from the RAW edge list (before self-loop removal) so
    # nodes appearing only in self-loops still get a component (themselves)
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    all_nodes = (
        raw.select(F.col("src").alias("node"))
        .union(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = _canonical_edges(edges, src, dst)

    prev_checksum = None
    for i in range(max_iterations):
        e = _small_star(_large_star(e))
        # Eager checkpoint EVERY round: truncates lineage AND guarantees
        # the convergence-check action and the next round share one
        # materialization. Measured on a 1.5M-edge single-giant-component
        # graph: eager-every-round 116s vs lazy-every-3 234s — the lazy
        # variant recomputed rounds. (A configurable interval was removed:
        # it could not change materialization behavior, only lineage cuts,
        # and silently ignoring it misled callers.)
        e = e.localCheckpoint(eager=True)
        # Converged when the edge multiset is stable: compare an
        # order-insensitive checksum (one aggregation, no join).
        # bit_xor (not sum) — overflow-free under ANSI mode at any scale.
        checksum = e.select(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()
        checksum = (checksum["n"], checksum["h"])
        if checksum == prev_checksum:
            break
        prev_checksum = checksum

    # After convergence every edge points directly at the component root.
    assign = e.groupBy("src").agg(F.min("dst").alias("component"))
    assign = assign.select(
        F.col("src").alias("node"),
        F.least(F.col("component"), F.col("node")).alias("component"),
    )
    roots = (
        all_nodes.join(assign, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    # Roots themselves appear only as dst after convergence; ensure they
    # are present and map to themselves.
    missing_roots = (
        roots.select(F.col("component").alias("node"))
        .distinct()
        .join(roots.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return roots.unionByName(missing_roots).distinct()


def canonicalize_ids(
    nodes: DataFrame,
    same_as_edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rewrite node ids to their component-canonical representative.

    Nodes not mentioned in any ``same_as`` edge keep their own id. The
    mapping join is an equi-join on id; the mapping side is usually much
    smaller than the node table (only nodes participating in equivalences)
    — Catalyst/AQE broadcasts it when it fits.
    """
    mapping = connected_components(same_as_edges, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    return (
        nodes.join(mapping, id_col, "left")
        .withColumn(
            "canonical_id", F.coalesce(F.col("component"), F.col(id_col))
        )
        .drop("component")
    )
