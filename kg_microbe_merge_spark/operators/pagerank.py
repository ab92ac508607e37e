"""Distributed PageRank over a KG edge DataFrame (power iteration).

Companion to :mod:`.components` on the graph-materialize side of the
pipeline (reference scope: kg_microbe_merge/merge.py's whole-graph
merge — the reference stops at merging; rank/centrality is the natural
next analytic a merged-KG consumer runs, and the shape is the canonical
iterative-DataFrame workload).

Semantics (the Spark-canonical, un-normalized formulation)::

    rank_0(n)     = 1.0
    rank_{i+1}(n) = (1 - d) + d * sum_{(m,n) in E} rank_i(m) / outdeg(m)

Dangling nodes (no out-links) receive rank but contribute nothing —
i.e. no dangling-mass redistribution; ranks are not a probability
distribution, they are the standard "Spark examples" fixed point. A
fixed iteration count (default 5) keeps the computation deterministic
and lets an ANSI-SQL oracle unroll the exact same recurrence.

Scale design (what survives 100 TB / 10^9 nodes):

* The EDGE table — by far the big side — is joined with out-degrees and
  hash-partitioned by ``src`` ONCE, then persisted; every iteration
  re-joins the (small, O(nodes)) rank table against that cached,
  pre-partitioned edge relation, so per-iteration shuffle volume is
  O(nodes + contributions), never a re-shuffle of the edges.
* Per-iteration work is two exchanges: ranks → the edge partitioning
  (equi-join on ``src``) and the map-side-combined ``sum`` of
  contributions on ``dst``. The per-``dst`` sum is partially
  aggregable, so hub nodes (huge in-degree) never materialize their
  in-neighbor list on one reducer — same argument as the ``min``
  aggregation in :func:`.components.connected_components`.
* The rank table is eagerly ``localCheckpoint``-ed every iteration:
  lineage stays O(1) instead of O(iterations) (on a real cluster use
  ``checkpoint`` with a checkpoint dir for fault-tolerant truncation,
  as in the components module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int | None = 6,
    weight: str | None = None,
    personalize: list | None = None,
) -> DataFrame:
    """Return ``(node, rank)`` after ``iterations`` power-iteration
    rounds over the directed edge list.

    Parallel edges are kept (each contributes), self-loops are kept
    (a node may feed its own rank); the node universe is every distinct
    ``src`` or ``dst``. ``round_to`` rounds the final rank (6 decimals
    by default — the cross-engine float convention used throughout the
    oracle gate); pass ``None`` for raw doubles.

    ``weight`` names an edge-multiplicity column: a weighted edge is
    mathematically the parallel-edge expansion (out-share = w/sum(w))
    without materializing the expansion — the scale path for rolled-up
    relations like the host link graph (functions/links.py), where one
    (src, dst, n_links) row stands for n_links anchors. Unweighted
    (default) is the exact w = 1 special case.

    ``personalize`` lists seed node ids for PERSONALIZED PageRank —
    entity relatedness from a query set: the teleport term becomes
    ``(1-d)·p(n)`` with ``p = 1/|seeds|`` on the seeds and 0 elsewhere
    (``rank_0 = p`` likewise), so rank mass only ever enters at the
    seeds and diffuses outward; nodes unreachable from the seed set
    converge to exactly 0. The seed set is a handful of ids — the
    indicator compiles to a row-local ``isin`` literal, adding ZERO
    exchanges to the iteration (same plan shape as the global variant).
    """
    w = (
        F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # One-time shuffle of the big relation: edges+degree, partitioned by
    # the join key every iteration reuses. MEMORY_AND_DISK: at 100 TB the
    # edge relation spills rather than evicting mid-iteration.
    linked = (
        e.join(outdeg, "src")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    if personalize is not None:
        if not personalize:
            raise ValueError("personalize must be a non-empty seed list")
        p = F.when(
            F.col("node").isin(list(personalize)),
            F.lit(1.0) / F.lit(float(len(set(personalize)))),
        ).otherwise(F.lit(0.0))
    else:
        p = F.lit(1.0)

    ranks = nodes.select("node", p.alias("rank"))
    for _ in range(iterations):
        contribs = (
            linked.join(ranks, linked["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias(
                    "contrib"
                ),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("contrib"))
        )
        # (1-d)·p folds to the familiar constant teleport in the global
        # case (p ≡ 1) and to the seed indicator when personalized
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping) * p
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        # O(nodes) materialization; truncates lineage so iteration i+1's
        # plan does not embed iterations 1..i.
        ranks = ranks.localCheckpoint(eager=True)

    linked.unpersist()
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks
