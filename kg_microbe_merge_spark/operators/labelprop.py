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


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman modularity of a community ``assignment`` over the
    undirected simple graph — the evaluation face of
    :func:`label_propagation` (and of CC/SCC-derived partitions):
    score a proposed community structure before acting on it.

    Q = Σ_c [ e_c/m − (d_c/(2m))² ] where m = |E| (undirected,
    deduped, self-loops dropped), e_c = intra-community edge count and
    d_c = the community's degree sum. Returned EXACTLY, per community,
    as pure BIGINTs — no division anywhere, so both engines agree bit
    for bit and the caller sums q_term_num / q_den (one shared
    denominator 4m²) only at presentation time::

        (community, n_nodes, intra_edges, degree_sum,
         q_term_num = 4·m·e_c − d_c², q_den = 4·m²)

    ``assignment`` is (node, community); edge-incident nodes missing
    from it count as their own singleton community (coalesce to the
    node id — the LPA initial state, so a partial assignment degrades
    gracefully instead of silently dropping edges).

    Scale: one count action for m, then a degree aggregation, two
    id-keyed assignment joins (the merge/coverage shuffle key) and one
    grouped count per side — all map-side combinable; nothing is ever
    quadratic in community size.
    """
    g = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = g.count()
    lab = assignment.select(
        F.col("node").alias("n"), F.col("community").alias("c")
    )
    deg = (
        g.select(F.col("a").alias("n"))
        .unionByName(g.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    degc = (
        deg.join(lab, "n", "left")
        .select(F.coalesce("c", "n").alias("community"), "deg")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    la = lab.select(F.col("n").alias("a"), F.col("c").alias("ca"))
    lb = lab.select(F.col("n").alias("b"), F.col("c").alias("cb"))
    intra = (
        g.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("ca", "a").alias("ca"),
            F.coalesce("cb", "b").alias("cb"),
        )
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    return (
        degc.join(intra, "community", "left")
        .select(
            "community",
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.coalesce("intra_edges", F.lit(0))
            .cast("bigint")
            .alias("intra_edges"),
            F.col("degree_sum").cast("bigint").alias("degree_sum"),
            (
                F.lit(4 * m) * F.coalesce("intra_edges", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("bigint")
            .alias("q_term_num"),
            F.lit(4 * m * m).cast("bigint").alias("q_den"),
        )
    )
