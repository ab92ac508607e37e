"""1-dimensional Weisfeiler–Leman (WL) color refinement: structural
node fingerprints and graph-level signatures, per graph_id.

Where this sits in the KG pipeline: extraction emits millions of small
entity subgraphs (per-page mention graphs, per-domain link motifs).
Two questions recur at scale: *which nodes play the same structural
role* (hub vs leaf vs bridge — input features for ER scoring beyond
name tokens) and *which subgraphs are structurally identical* (motif
dedup — the graph-shaped member of the dedup family, where text dedup
sees nothing). 1-WL answers both: after ``r`` rounds, nodes with equal
colors are indistinguishable by any r-hop structural test, and the
color HISTOGRAM is the classic graph-isomorphism signature (complete
for almost all graphs; the known blind spots — e.g. C6 vs 2×C3 — are
pinned in tests as documented behavior, not bugs).

Hub-safe refinement (the deviation from the textbook, documented):
textbook WL re-colors by the SORTED LIST of neighbor colors — at
10^12 edges that collects a hub's 10^6-color array onto one reducer.
Here the neighbor multiset is folded with a commutative-sum hash
combine instead::

    term(u)   = hash60(color_u : 'wl-n') mod 2^31
    combine(v) = (Σ_{u∈N(v)} term(u),  |N(v)|)
    color'(v) = hash60(color_v : Σ : count : 'wl-c')

The sum is partially aggregable (map-side combine — a hub costs one
combiner cell per task, the ``token_counts`` discipline), fits BIGINT
up to 2^32 neighbors (2^31 · 2^32 = 2^63), and is deterministic in
both engines, so the DuckDB twin (:func:`wl_colors_sql`, rounds
unrolled as MATERIALIZED CTEs) matches value for value. Multiset-sum
collisions are possible in principle (the price of commutativity);
at 60/31-bit widths they are measure-zero next to 1-WL's own
structural blind spots.

Graph signatures: per graph, the sorted ``color:count`` histogram is
hashed into one BIGINT. The collect is per-GRAPH (extraction subgraphs
are small — pages emit tens of mentions); for one giant graph use the
node colors directly.

Reference parity: no structural-graph machinery exists in the
reference; this extends the dedup/ER family (blocking, meta-blocking,
same_as CC) with the structure-only signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, hash60, hash60_sql

_GID = "__wl_gid"


def _prep(edges: DataFrame, src: str, dst: str, graph_col: str | None):
    g = (
        F.col(graph_col).cast("string")
        if graph_col
        else F.lit("g")
    )
    e = edges.select(
        g.alias(_GID),
        F.col(src).cast("string").alias("a"),
        F.col(dst).cast("string").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return (
        e.unionByName(
            e.select(_GID, F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "subject",
    dst: str = "object",
    graph_col: str | None = None,
    label_col: str | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """``(graph_id, node, color)`` after ``rounds`` WL refinements.
    Initial colors come from ``labels`` (a (graph_id?, node, label)
    DataFrame) when given, else every node starts identically. Each
    round: ONE edge⋈colors join + ONE map-side-partial sum/count
    aggregation + a row-local re-hash; eager localCheckpoint per round
    (O(1) lineage)."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = _prep(edges, src, dst, graph_col).localCheckpoint(eager=True)
    nodes = und.select(_GID, F.col("a").alias("node")).distinct()
    if labels is not None:
        lab_g = (
            F.col(graph_col).cast("string") if graph_col else F.lit("g")
        )
        lab = labels.select(
            lab_g.alias(_GID),
            F.col("node").cast("string").alias("node"),
            F.col(label_col or "label").cast("string").alias("_lab"),
        )
        colors = nodes.join(lab, [_GID, "node"], "left").select(
            _GID,
            "node",
            hash60(F.coalesce(F.col("_lab"), F.lit(""))).alias("color"),
        )
    else:
        colors = nodes.withColumn("color", hash60(F.lit("")))
    colors = colors.localCheckpoint(eager=True)
    for _r in range(rounds):
        term = (
            hash60(
                F.concat_ws(
                    ":", F.col("color").cast("string"), F.lit("wl-n")
                )
            )
            % F.lit(MERSENNE31)
        )
        nbr = (
            und.join(
                colors.select(
                    _GID, F.col("node").alias("b"), "color"
                ),
                [_GID, "b"],
            )
            .select(_GID, F.col("a").alias("node"), term.alias("t"))
            .groupBy(_GID, "node")
            .agg(
                F.sum("t").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("c"),
            )
        )
        colors = (
            colors.join(nbr, [_GID, "node"], "left")
            .select(
                _GID,
                "node",
                hash60(
                    F.concat_ws(
                        ":",
                        F.col("color").cast("string"),
                        F.coalesce(F.col("s"), F.lit(0)).cast("string"),
                        F.coalesce(F.col("c"), F.lit(0)).cast("string"),
                        F.lit("wl-c"),
                    )
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    return colors.select(
        F.col(_GID).alias("graph_id"), "node", "color"
    )


def wl_signatures(colors: DataFrame) -> DataFrame:
    """Per-graph structural signature ``(graph_id, n_nodes,
    signature)``: hash of the sorted ``color:count`` histogram. The
    histogram collect is per GRAPH — sized for extraction subgraphs,
    not the whole KG."""
    hist = colors.groupBy("graph_id", "color").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_graph = hist.groupBy("graph_id").agg(
        F.sum("n").cast("long").alias("n_nodes"),
        F.array_sort(
            F.collect_list(
                F.concat_ws(
                    ":",
                    F.col("color").cast("string"),
                    F.col("n").cast("string"),
                )
            )
        ).alias("_h"),
    )
    return per_graph.select(
        "graph_id",
        "n_nodes",
        hash60(F.array_join(F.col("_h"), ",")).alias("signature"),
    )


def structural_dup_groups(signatures: DataFrame) -> DataFrame:
    """Structurally-identical subgraph groups: ``(signature, n_nodes,
    n_graphs, graph_ids)`` for signatures shared by ≥ 2 graphs —
    the motif-dedup output (sorted ids, deterministic)."""
    return (
        signatures.groupBy("signature", "n_nodes")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_graphs"),
            F.array_sort(F.collect_list("graph_id")).alias("graph_ids"),
        )
        .filter(F.col("n_graphs") >= 2)
    )


# --------------------------------------------------------------------------
# DuckDB twin
# --------------------------------------------------------------------------


def wl_colors_sql(
    edges_sql: str,
    rounds: int = 3,
    graph_expr: str = "'g'",
) -> str:
    """DuckDB twin of :func:`wl_colors` (unlabeled start) over a
    relation with (src, dst) columns — identical hash combine, rounds
    unrolled as MATERIALIZED CTEs."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    h_init = hash60_sql("''")
    parts = [
        f"""WITH wl_e AS MATERIALIZED (
    SELECT DISTINCT g, a, b FROM (
        SELECT ({graph_expr})::VARCHAR AS g, src::VARCHAR AS a,
               dst::VARCHAR AS b FROM ({edges_sql})
        UNION ALL
        SELECT ({graph_expr})::VARCHAR AS g, dst::VARCHAR AS a,
               src::VARCHAR AS b FROM ({edges_sql}))
    WHERE a <> b),
c0 AS MATERIALIZED (
    SELECT g, node, {h_init} AS color
    FROM (SELECT DISTINCT g, a AS node FROM wl_e))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        term = hash60_sql("c.color::VARCHAR || ':' || 'wl-n'")
        recolor = hash60_sql(
            "v.color::VARCHAR || ':' || coalesce(n.s, 0)::VARCHAR"
            " || ':' || coalesce(n.c, 0)::VARCHAR || ':' || 'wl-c'"
        )
        parts.append(
            f""", n{r} AS MATERIALIZED (
    SELECT e.g, e.a AS node,
           sum(({term}) % {MERSENNE31})::BIGINT AS s,
           count(*)::BIGINT AS c
    FROM wl_e e JOIN c{p} c ON c.g = e.g AND c.node = e.b
    GROUP BY e.g, e.a)
, c{r} AS MATERIALIZED (
    SELECT v.g, v.node, {recolor} AS color
    FROM c{p} v LEFT JOIN n{r} n ON n.g = v.g AND n.node = v.node)"""
        )
    return (
        "\n".join(parts)
        + f"\nSELECT g AS graph_id, node, color FROM c{rounds}"
    )


# --------------------------------------------------------------------------
# Python twin (tests)
# --------------------------------------------------------------------------


def wl_colors_py(edge_list, rounds: int = 3):
    """Twin over [(graph_id, a, b), ...]; returns
    {(graph_id, node): color}."""
    from collections import defaultdict

    from ..functions.hashing import hash60_py

    adj = defaultdict(set)
    nodes = set()
    for g, a, b in edge_list:
        g, a, b = str(g), str(a), str(b)
        if a == b:
            continue
        adj[(g, a)].add(b)
        adj[(g, b)].add(a)
        nodes.add((g, a))
        nodes.add((g, b))
    colors = {k: hash60_py("") for k in nodes}
    for _ in range(rounds):
        nxt = {}
        for (g, v) in nodes:
            s, c = 0, 0
            for u in adj[(g, v)]:
                s += hash60_py(f"{colors[(g, u)]}:wl-n") % MERSENNE31
                c += 1
            nxt[(g, v)] = hash60_py(f"{colors[(g, v)]}:{s}:{c}:wl-c")
        colors = nxt
    return colors
