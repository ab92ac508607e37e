"""Label-propagation community detection (LPA, Raghavan et al. 2007)
over a KG edge DataFrame — the mode-based sibling of
:mod:`.components`: connected components answers "which nodes are
linked at all", LPA answers "which nodes cluster densely" (entity
communities in a merged KG, host communities in the crawl link graph,
near-dup families in a similarity graph).

Semantics (deterministic, synchronous — both engines replay it
exactly): labels start as the node id; each round every node adopts the
most frequent label among its neighbors' PREVIOUS-round labels, ties
broken to the lexicographically smallest label; nodes without
neighbors keep their label. A fixed iteration count (default 4) keeps
the computation deterministic and SQL-unrollable (asynchronous LPA is
run-order-dependent and has no oracle). The graph is symmetrized
(undirected) by default; self-loops are dropped (a node voting for
itself swamps real neighborhoods).

Scale design (10^9 nodes / 10^11 edges):

* The EDGE relation — the big side — is deduplicated, symmetrized and
  hash-partitioned by ``dst`` ONCE, then persisted; every round
  re-joins the O(nodes) label table against it, so per-round shuffle
  volume is O(nodes + votes), never a re-shuffle of edges (the
  :mod:`.pagerank` pattern).
* The per-(node, label) vote count is a partial aggregation — hub
  nodes never materialize their neighbor list on one reducer — and the
  per-node argmax is ``min(struct(-count, label))``, ALSO map-side
  combinable: two partially-aggregated exchanges per round, no window.
* Labels are eagerly ``localCheckpoint``-ed every round: lineage stays
  O(1) instead of O(iterations) (on a real cluster use reliable
  ``checkpoint``, as documented in :mod:`.components`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    directed: bool = False,
) -> DataFrame:
    """Return ``(node, community)`` after ``iterations`` synchronous
    LPA rounds. With ``directed=True`` each ``src`` node collects votes
    from its out-neighbors' labels only; the undirected default
    symmetrizes the edge list first, so votes flow both ways.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # one-time shuffle of the big relation, reused every round
    e = e.repartition("dst").persist(StorageLevel.MEMORY_AND_DISK)

    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(iterations):
        votes = e.join(labels, e["dst"] == labels["node"]).select(
            e["src"].alias("node"), F.col("community")
        )
        # argmax by (count desc, label asc) == min(struct(-count, label)):
        # both aggregation levels are map-side combinable
        best = (
            votes.groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("neg"),
                        F.col("community").alias("label"),
                    )
                ).alias("b")
            )
            .select("node", F.col("b.label").alias("new_community"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(
                    F.col("new_community"), F.col("community")
                ).alias("community"),
            )
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """(community, n_nodes) rollup of an LPA assignment — one
    map-side-combined count."""
    return labels.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
