"""Truncated Katz centrality with an exact integer protocol.

Katz centrality scores a node by its attenuated walk count:
``x(v) = Σ_k α^k · |walks of length k ending at v|`` — the
centrality between degree (k=1 only) and eigenvector/PageRank
(k→∞): unlike PageRank it does not divide endorsement by out-degree,
so a hub that links widely endorses every target fully (the natural
prior for alias/same_as endorsement graphs), and unlike HITS it
needs no normalization step.

This implementation computes the K-truncated sum by the recurrence

    c_0(v) = 0
    c_t(v) = (α_micro · Σ_{u→v} (10^6 + c_{t-1}(u))) div 10^6

in MICRO units (α = α_micro/10^6): c_K(v) is then exactly
``10^6 · Σ_{k=1..K} α^k·walks_k(v)`` up to the per-round floor — the
flooring is part of the defined semantics, making Spark, Python and
the DuckDB twin (:func:`katz_sql`, K rounds unrolled) agree bit for
bit with zero floats. α must satisfy α·λ_max < 1 for the untruncated
series to converge; the truncated form is total regardless, and K
bounds the horizon like bounded-hop BFS.

Scale: per round ONE edges⋈scores equi-join + a map-side-partial sum
keyed on the destination — the edge relation is shuffled once up
front (repartition by src, reused every round, the labelprop/
pagerank discipline) and per-round state is O(nodes); eager
``localCheckpoint`` keeps O(1) lineage.

Reference scope: beyond the reference; sibling of
pagerank/hits/hyperball. No reference code consulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

MICRO = 1_000_000


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    alpha_micro: int = 100_000,
    iterations: int = 4,
) -> DataFrame:
    """``(node, katz_micro)`` — K-truncated Katz scores in micro
    units for every node in the edge list (in-edge walks; transpose
    the edges for out-edge Katz)."""
    if not (0 < alpha_micro < MICRO):
        raise ValueError("alpha_micro must be in (0, 1_000_000)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scores = nodes.select(
        "node", F.lit(0).cast("bigint").alias("c")
    )
    for _ in range(iterations):
        contrib = (
            e.join(scores, e["src"] == scores["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.lit(MICRO) + F.col("c")).alias("s"))
            .select(
                "node",
                F.expr(f"({alpha_micro} * s) div {MICRO}")
                .cast("bigint")
                .alias("c_new"),
            )
        )
        scores = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.coalesce("c_new", F.lit(0)).cast("bigint").alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return scores.select("node", F.col("c").alias("katz_micro"))


def katz_sql(
    edges_sql: str,
    alpha_micro: int = 100_000,
    iterations: int = 4,
) -> str:
    """DuckDB twin: the identical integer recurrence unrolled as
    chained CTEs over an (src, dst) relation."""
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src::VARCHAR AS src, "
        f"dst::VARCHAR AS dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT dst FROM e)",
        "c0 AS (SELECT node, 0::BIGINT AS c FROM nodes)",
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"""c{t} AS MATERIALIZED (
    SELECT n.node,
           coalesce(({alpha_micro} * s.s) // {MICRO}, 0)::BIGINT AS c
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum({MICRO} + p.c) AS s
        FROM e JOIN c{t - 1} p ON p.node = e.src
        GROUP BY e.dst) s ON s.node = n.node)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, c AS katz_micro FROM c{iterations}"
    )


def katz_py(
    edge_list,
    alpha_micro: int = 100_000,
    iterations: int = 4,
):
    """Python twin over [(src, dst), ...] pairs (tests)."""
    e = sorted({(str(a), str(b)) for a, b in edge_list})
    nodes = {a for a, _ in e} | {b for _, b in e}
    c = {n: 0 for n in nodes}
    for _ in range(iterations):
        s: dict = {}
        for a, b in e:
            s[b] = s.get(b, 0) + MICRO + c[a]
        c = {n: (alpha_micro * s.get(n, 0)) // MICRO for n in nodes}
    return c
