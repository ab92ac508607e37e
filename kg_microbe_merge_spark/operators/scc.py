"""Strongly connected components over a DIRECTED edge DataFrame —
the directed complement of :mod:`.components` (which solves the
undirected/same_as case).

Why a KG engine needs it: predicate edges are directed; mutual-
reachability clusters (subclass cycles, alias loops, redirect rings in
the crawl link graph) are exactly the structures that must collapse to
one canonical node before the graph is a DAG that taxonomy rollups and
cycle-sensitive algorithms (topological order, longest path) can run
on. CC over-merges here — A→B without B→A must NOT canonicalize.

Algorithm — min-label forward-backward (the MultiStep method of
Slota/Rajamanickam/Madduri, distilled to DataFrame ops):

repeat until no active nodes:
  1. **trim** (iterated): a node with no in-edges or no out-edges
     among active nodes is its own singleton SCC — settle and remove.
     Trimming to fixpoint dissolves entire DAG regions without any
     propagation (most KG predicate graphs are DAG-dominated, so this
     is the common fast path).
  2. **fwd(v)** = min node id that REACHES v: propagate min labels
     along edges to fixpoint. **bwd(v)** = min id v reaches: same
     along reversed edges.
  3. A node with ``fwd(v) == bwd(v) == m`` is mutually reachable with
     ``m`` — settle ``(v, m)``; every settled group is one whole SCC
     (in particular the SCC of the globally smallest active id always
     settles). Remove settled nodes and repeat on the remainder.

Scale notes:

* Every step is joins + partially-aggregable ``min`` groupBys — the
  same shuffle discipline as :func:`.components.connected_components`;
  no adjacency list ever materializes on one reducer.
* Label propagation is eager-``localCheckpoint``-ed per round with a
  count-of-changes convergence action (O(1) driver data); phases
  re-filter the persisted-once edge relation.
* Rounds per phase are bounded by the active subgraph's diameter, and
  phases by the SCC "peeling depth"; for diameter-heavy adversaries,
  the undirected-CC trick of doubling edges does not apply (direction
  matters), so ``max_phases`` bounds the loop and raises rather than
  spinning — the standard caveat of every distributed SCC method.

Reference parity: the reference has no directed-graph analytics; this
completes the centrality/structure family (pagerank / HITS / CC /
k-core / triangles / label-prop / link-pred) on the directed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_label_fixpoint(
    nodes: DataFrame, edges: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """Propagate min node-id labels along ``from_col → to_col`` to
    fixpoint; returns (node, lbl) where lbl = min id with a directed
    path to the node (including itself)."""
    labels = nodes.select("node", F.col("node").alias("lbl"))
    while True:
        pushed = (
            edges.join(labels, edges[from_col] == labels["node"])
            .groupBy(F.col(to_col).alias("node"))
            .agg(F.min("lbl").alias("_in"))
        )
        new = (
            labels.join(pushed, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("_in"), F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce(F.col("_in"), F.col("lbl")) < F.col("lbl")).alias(
                    "_chg"
                ),
            )
            # lazy: the changed-count below scans every partition and
            # materializes the checkpoint (one job/round, not two)
            .localCheckpoint(eager=False)
        )
        changed = new.filter(F.col("_chg")).count()
        labels = new.select("node", "lbl")
        if changed == 0:
            return labels


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the smallest
    node id in the node's SCC (the :func:`.components` canonical-id
    convention). The node universe is every distinct endpoint;
    self-loops are fine (a node is always in its own SCC)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # empty frame with the right id type, whatever it is
    settled = nodes.select("node", F.col("node").alias("component")).limit(0)

    active_nodes, active_edges = nodes, e
    for _ in range(max_phases):
        if active_nodes.isEmpty():
            return settled
        # 1. trim to fixpoint: no in-edges or no out-edges → singleton
        while True:
            has_out = active_edges.select(F.col("src").alias("node")).distinct()
            has_in = active_edges.select(F.col("dst").alias("node")).distinct()
            trivial = active_nodes.join(has_out, "node", "left_anti").union(
                active_nodes.join(has_in, "node", "left_anti")
            ).distinct().localCheckpoint(eager=False)
            n_trivial = trivial.count()
            if n_trivial == 0:
                break
            settled = settled.union(
                trivial.select("node", F.col("node").alias("component"))
            ).localCheckpoint(eager=True)
            active_nodes = active_nodes.join(
                trivial, "node", "left_anti"
            ).localCheckpoint(eager=True)
            active_edges = (
                active_edges.join(
                    trivial.select(F.col("node").alias("src")), "src", "left_anti"
                )
                .join(
                    trivial.select(F.col("node").alias("dst")), "dst", "left_anti"
                )
                .localCheckpoint(eager=True)
            )
        if active_nodes.isEmpty():
            return settled
        # 2. forward/backward min-label fixpoints on the active subgraph
        fwd = _min_label_fixpoint(active_nodes, active_edges, "src", "dst")
        bwd = _min_label_fixpoint(active_nodes, active_edges, "dst", "src")
        # 3. settle mutual-reachability matches
        done = (
            fwd.alias("f")
            .join(bwd.alias("b"), "node")
            .filter(F.col("f.lbl") == F.col("b.lbl"))
            .select("node", F.col("f.lbl").alias("component"))
            .localCheckpoint(eager=True)
        )
        settled = settled.union(done).localCheckpoint(eager=True)
        active_nodes = active_nodes.join(done, "node", "left_anti").localCheckpoint(
            eager=True
        )
        active_edges = (
            active_edges.join(
                done.select(F.col("node").alias("src")), "src", "left_anti"
            )
            .join(done.select(F.col("node").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"SCC did not settle within max_phases={max_phases} "
        "(pathological peeling depth); raise max_phases"
    )


def condensation(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The condensation DAG: map both endpoints through the SCC
    ``(node, component)`` assignment, drop intra-SCC edges, dedup.
    Always acyclic — the precondition for every order-sensitive rollup.
    Two broadcast-or-shuffle joins against the (small, O(nodes))
    assignment; the edge table is touched once."""
    a_src = assignment.select(
        F.col("node").alias(src), F.col("component").alias("_cs")
    )
    a_dst = assignment.select(
        F.col("node").alias(dst), F.col("component").alias("_cd")
    )
    return (
        edges.select(src, dst)
        .join(a_src, src)
        .join(a_dst, dst)
        .filter(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .distinct()
    )


def topological_levels(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_levels: int = 1000,
) -> DataFrame:
    """Longest-path layering of a DAG: ``(node, level)`` where level 0
    nodes have no in-edges and ``level(v) = 1 + max(level(u))`` over
    in-neighbors — the taxonomy-depth / build-order query, run on the
    :func:`condensation` output (feeding it a cyclic graph raises).

    Kahn peeling, one level per round: remove current sources, a node
    becomes a source when ALL in-edges are gone. Each round is one
    distinct-projection + two anti joins + eager checkpoint — O(level
    width) driver data, rounds bounded by the DAG depth (for a KG
    taxonomy: tens, not thousands)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    remaining_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = remaining_nodes.select(
        "node", F.lit(0).cast("int").alias("level")
    ).limit(0)
    remaining_edges = e
    for lvl in range(max_levels):
        if remaining_nodes.isEmpty():
            return out
        has_in = remaining_edges.select(F.col("dst").alias("node")).distinct()
        sources = remaining_nodes.join(has_in, "node", "left_anti").localCheckpoint(
            eager=True
        )
        if sources.isEmpty():
            raise ValueError(
                "graph has a cycle (no sources left among remaining "
                "nodes) — run strongly_connected_components + "
                "condensation first"
            )
        out = out.union(
            sources.select("node", F.lit(lvl).cast("int").alias("level"))
        ).localCheckpoint(eager=True)
        remaining_nodes = remaining_nodes.join(
            sources, "node", "left_anti"
        ).localCheckpoint(eager=True)
        remaining_edges = remaining_edges.join(
            sources.select(F.col("node").alias("src")), "src", "left_anti"
        ).localCheckpoint(eager=True)
    raise RuntimeError(f"DAG deeper than max_levels={max_levels}")
