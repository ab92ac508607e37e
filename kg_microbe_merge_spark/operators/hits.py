"""HITS hubs & authorities over a KG edge DataFrame (power iteration).

Completes the centrality family next to :mod:`.pagerank`: PageRank
scores global importance; HITS separates DIRECTORY pages (hubs — link
to many good authorities) from CONTENT pages (authorities — linked by
many good hubs), the natural decomposition for the crawl link graph
(functions/links.py) and for typed KGs where sources and sinks play
different roles.

Semantics (Kleinberg's iteration, max-normalized)::

    hub_0(n)  = 1.0
    auth_i(n) = sum_{(m,n) in E} hub_{i-1}(m)   then  auth_i /= max(auth_i)
    hub_i(n)  = sum_{(n,m) in E} auth_i(m)      then  hub_i  /= max(hub_i)

Parallel edges are collapsed (HITS is defined on the adjacency
structure); self-loops are kept. Max-normalization (not L2) is chosen
deliberately for the cross-engine gate: ``max`` over doubles is
summation-order-independent, so the only engine divergence is the
per-node sum order (~1e-13 relative), absorbed by the final
``round(6)`` exactly as in :mod:`.pagerank`. A fixed iteration count
keeps the recurrence unrollable as chained CTEs in the DuckDB oracle.

Scale design (the :mod:`.pagerank` shape, applied twice per round):

* The deduped edge table is persisted ONCE partitioned on ``src``;
  every iteration's two half-steps re-join the (small, O(nodes)) score
  table against it. Per-round shuffles: scores → edge partitioning and
  the map-side-combined ``sum`` per endpoint — hub nodes with 10^6
  in-links never materialize a neighbor list on one reducer.
* The normalizer is a single-row max-aggregate BROADCAST back over the
  sum table (BroadcastNestedLoopJoin of one row — the declarative form
  of collect-and-re-literalize): no driver collect anywhere in the
  recurrence.
* ONE eager ``localCheckpoint`` per round bounds the logical plan
  (each half-step's sum table appears twice downstream, so the tree
  would double per half-step — 2^8 subtrees for 4 rounds — without the
  round barrier) while halving the action count of a
  collect-per-half-step design. On a real cluster use reliable
  ``checkpoint`` (see :mod:`.components`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    round_to: int | None = 6,
) -> DataFrame:
    """Return ``(node, hub, authority)`` after ``iterations`` rounds of
    the max-normalized HITS recurrence over the directed edge list.
    Nodes with no in-links have authority 0; no out-links, hub 0.
    ``round_to`` rounds the final scores (6 decimals, the oracle-gate
    float convention); pass ``None`` for raw doubles."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    # both half-steps join the big edge relation on THEIR end — persist
    # one copy per orientation, each pre-partitioned on its join key, so
    # per-iteration shuffles move only the O(nodes) score table
    e_by_src = e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    e_by_dst = e.repartition("dst").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = None
    for _ in range(iterations):
        auths = _half_step(e_by_src, hubs, "hub", "src", "dst", "authority")
        hubs = _half_step(e_by_dst, auths, "authority", "dst", "src", "hub")
        # ONE action per ROUND (the eager checkpoint), none per
        # half-step and no driver collects: each half-step's sum table
        # appears twice in the downstream plan (feeding the next step
        # AND under its own broadcast max-normalizer), so the logical
        # tree doubles per half-step — the round checkpoint resets it
        # to a leaf, keeping analysis/optimization O(1) per round while
        # halving the action count of the old collect-per-half-step
        # design
        hubs = hubs.localCheckpoint(eager=True)
    auths = auths.localCheckpoint(eager=True)
    e_by_src.unpersist()
    e_by_dst.unpersist()
    # zero-fill ONCE at the output: intermediate half-steps carry only
    # nonzero scores (zero-score nodes contribute nothing to the sums,
    # so dropping their explicit rows is exact), which removes a
    # nodes-left-join shuffle from every half-step
    out = (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )
    if round_to is not None:
        out = out.select(
            "node",
            F.round("hub", round_to).alias("hub"),
            F.round("authority", round_to).alias("authority"),
        )
    return out


def _half_step(
    e: DataFrame,
    scores: DataFrame,
    score_col: str,
    join_end: str,
    sum_end: str,
    out_col: str,
) -> DataFrame:
    """One HITS half-step: propagate ``score_col`` across edges from
    ``join_end`` to ``sum_end``, max-normalize. ZERO driver actions:
    the single-row max-aggregate is broadcast back over the sum table
    (BroadcastNestedLoopJoin of a 1-row relation — the declarative form
    of collect-and-re-literalize), so the whole multi-round recurrence
    stays one lazy plan and the driver never synchronizes mid-round.
    Scores are nonnegative, so max over the nonzero rows equals max
    over the zero-filled table; max over doubles is summation-order
    independent — the value is identical to the collected variant."""
    raw = (
        e.join(scores, e[join_end] == scores["node"])
        .groupBy(F.col(sum_end).alias("node"))
        .agg(F.sum(score_col).alias("_s"))
    )
    mx = raw.agg(F.max("_s").alias("_mx"))
    return raw.crossJoin(F.broadcast(mx)).select(
        "node",
        F.when(
            F.col("_mx").isNull() | (F.col("_mx") <= 0.0), F.lit(0.0)
        )
        .otherwise(F.col("_s") / F.col("_mx"))
        .alias(out_col),
    )
