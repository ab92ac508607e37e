"""Multi-source k-hop BFS over a KG edge DataFrame.

Neighborhood queries are the other half of graph analytics next to the
global algorithms already here (connected components, PageRank): "every
node within k hops of these seed entities" drives KG curation (pull the
subgraph around a disease/taxon seed set), contamination blast-radius
checks, and negative-sampling exclusion zones. The reference has no
graph-traversal operator (its graph work is the in-memory merge,
kg_microbe_merge/merge.py:50-60); this is Spark-first frontier
expansion.

Scale notes
-----------
* Each hop is ONE join of the current frontier against the edge
  relation keyed on ``src`` plus one anti join against the visited set
  — both shuffle O(frontier·out-degree), never O(graph). The edge
  relation is shuffle-hash/sort-merge partitioned on ``src`` once and
  reused by every hop (``persist`` below), so hops 2..k reuse the
  exchange.
* The frontier is ``localCheckpoint``-ed each hop: truncates lineage
  (no O(k)-deep plan) and shares one materialization between the
  emptiness check and the next hop's join (same discipline as
  ``operators/components``; swap for reliable ``checkpoint`` on a real
  cluster).
* Visited-set maintenance is an accumulated union of per-hop frontiers
  (each already distinct and disjoint from earlier hops by the anti
  join), so the final result needs no extra dedup or min-aggregation.
* Early exit when a frontier empties — the per-hop driver action is a
  1-row ``count`` of an already-materialized DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "subject",
    dst: str = "object",
    directed: bool = True,
) -> DataFrame:
    """Return ``(id, dist)``: the minimum hop count (0..max_hops) from
    any node in ``sources`` (a 1-column DataFrame of node ids) along
    ``edges``, for every node reachable within ``max_hops``.

    ``directed=False`` symmetrizes the edge relation first (KG same-as /
    undirected neighborhoods)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    e = e.filter(F.col("_s") != F.col("_d")).distinct().persist()

    frontier = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier.select("id", F.lit(0).alias("dist"))
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier["id"] == e["_s"])
            .select(F.col("_d").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.union(
            frontier.select("id", F.lit(hop).alias("dist"))
        ).localCheckpoint(eager=True)
    e.unpersist()
    return visited
