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
* A LAZY ``localCheckpoint`` EVERY round truncates lineage so the plan
  doesn't grow unboundedly; the round's convergence-check aggregation
  is the action that materializes it, so the check and the next round
  share one stored copy at a cost of ONE job per round (on a real
  cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
  for fault-tolerant truncation).
* Convergence check is a single ``count`` of changed labels per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
        # Checkpoint EVERY round, but LAZILY: the convergence-check
        # action below is what materializes it, so each round runs ONE
        # job instead of two (eager ckpt + checksum) — measured 1.3×
        # on the sf0.1 CC gate queries with identical results. The
        # checksum aggregates over every partition of the checkpointed
        # plan, so the materialization guarantee is the same as eager;
        # the next round and the convergence check still share one
        # stored copy. (Checkpoint INTERVAL remains every-round: a
        # 1.5M-edge measurement showed every-3-rounds recomputing star
        # rounds at 2× total cost — eagerness, not cadence, is what
        # this optimizes.)
        e = e.localCheckpoint(eager=False)
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


def _quotient_components(
    qe: DataFrame, max_iterations: int, driver_threshold: int
) -> DataFrame:
    """CC over the (already materialized, delta-sized) quotient edge
    list. Below ``driver_threshold`` edges the quotient is
    broadcast-class data — the same size class Spark itself collects to
    the driver for a broadcast join — so it is solved with one
    driver-side union-find pass (exact min-id labels, identical output)
    instead of paying O(log d) distributed star-contraction rounds
    whose per-round job/checkpoint overhead dominates at delta scale
    (measured: a 1,770-edge quotient took ~15 s distributed, <1 s
    collected). Above the threshold the distributed
    :func:`connected_components` run is used unchanged."""
    if qe.count() > driver_threshold:
        return connected_components(qe, max_iterations=max_iterations).localCheckpoint(
            eager=True
        )
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in qe.collect():
        a, b = row["src"], row["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        if r not in comp_min or x < comp_min[r]:
            comp_min[r] = x
    node_type = qe.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("component", node_type, False),
        ]
    )
    rows = [(x, comp_min[find(x)]) for x in parent]
    return qe.sparkSession.createDataFrame(rows, schema)


def connected_components_incremental(
    assignment: DataFrame,
    delta_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Fold a batch of NEW ``same_as`` edges into an existing
    ``(node, component)`` assignment without recomputing over the full
    edge set — the connected-components half of incremental KG
    maintenance (``operators/upsert.py`` folds the node/edge tables;
    this folds the canonicalization mapping).

    Equivalence invariant (tested in ``tests/test_components.py`` and
    driver-gated as ``kg_incremental_cc``)::

        connected_components_incremental(connected_components(E0), E1)
          ≡ connected_components(E0 ∪ E1)

    Preconditions: ``assignment`` uses min-id representatives and has a
    row for every node of E0 — exactly what :func:`connected_components`
    returns. Nodes in ``delta_edges`` never seen before are admitted and
    rooted correctly (they appear in the quotient graph as themselves).

    Scale design (the reason this exists): at 10^12 nodes a daily
    same-as delta is ~10^6 edges. The full assignment is touched by
    exactly TWO broadcast-hash joins (always the streamed side, never
    shuffled): (1) look up the old roots of the delta endpoints,
    (2) remap the components that merged. Everything else — the
    quotient graph (old roots of delta endpoints + brand-new ids) and
    the CC run over it — is proportional to the DELTA, not the graph.
    The quotient solve is hybrid: at ≤ ``driver_threshold`` edges it is
    broadcast-class data (a 10^6-edge daily delta is ~tens of MB — the
    size class Spark collects for broadcast joins) and one driver-side
    union-find replaces O(log d) star-contraction rounds of per-round
    job overhead; larger quotients take the distributed
    :func:`connected_components` path unchanged. Correctness of min-id
    composition: each old root is the minimum of its old component, so
    the quotient minimum equals the global minimum of the merged
    component.
    """
    raw = (
        delta_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    endpoints = (
        raw.select(F.col("src").alias("node"))
        .union(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Broadcast join #1: old roots of the delta endpoints. `assignment`
    # is the stream side; only the (small) endpoint set is broadcast.
    seen = assignment.join(F.broadcast(endpoints), "node").select(
        "node", "component"
    )
    # The remaining joins are all delta-sized on BOTH sides; explicit
    # broadcast hints keep the static plan sort-merge-free.
    root_of = (
        endpoints.join(F.broadcast(seen), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("root"),
        )
    )
    # Quotient graph over old roots + brand-new ids. Self-loops are kept
    # (connected_components admits their nodes via its raw node universe).
    qe = (
        raw.join(
            F.broadcast(
                root_of.select(
                    F.col("node").alias("src"), F.col("root").alias("_sr")
                )
            ),
            "src",
        )
        .join(
            F.broadcast(
                root_of.select(
                    F.col("node").alias("dst"), F.col("root").alias("_dr")
                )
            ),
            "dst",
        )
        .select(F.col("_sr").alias("src"), F.col("_dr").alias("dst"))
    )
    # Delta-sized and consumed by two branches (remap + new rows):
    # materialize once and truncate the quotient-run lineage.
    qe = qe.localCheckpoint(eager=True)
    qcc = _quotient_components(qe, max_iterations, driver_threshold)
    # Broadcast join #2: remap merged components across the full
    # assignment. `moved` is at most one row per quotient node.
    moved = qcc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("component"), F.col("component").alias("_new")
    )
    updated = assignment.join(F.broadcast(moved), "component", "left").select(
        "node", F.coalesce(F.col("_new"), F.col("component")).alias("component")
    )
    # Brand-new nodes: quotient nodes with no prior assignment row.
    new_rows = (
        endpoints.join(F.broadcast(seen.select("node")), "node", "left_anti")
        .join(F.broadcast(qcc), "node")
        .select("node", "component")
    )
    return updated.unionByName(new_rows)


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
