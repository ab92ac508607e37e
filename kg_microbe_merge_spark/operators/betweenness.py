"""Sampled bounded-hop betweenness centrality (Brandes + source
sampling) with an exact integer dependency protocol.

Betweenness ranks a node by the shortest paths THROUGH it — the
broker/bottleneck signal none of the engine's other centralities
capture (PageRank/Katz/HITS reward endorsement, k-core/degree reward
density; a low-degree node bridging two communities is invisible to
all of them but dominates betweenness). On a KG it surfaces hub
entities whose removal disconnects reasoning chains, and same_as
brokers that glue otherwise-separate identity clusters — prime
over-merge suspects.

Exact betweenness is all-pairs BFS — Θ(V·E), hopeless at 10^12
edges. The standard estimator (Brandes/Pich, Riondato-Kornaropoulos)
samples source nodes and bounds the horizon:

* ``k`` sources, chosen deterministically as the smallest
  ``hash60(node)`` values (reproducible across engines and runs; or
  pass an explicit ``sources`` DataFrame);
* forward sweep (≤ ``max_hops`` rounds): per round ONE frontier⋈edges
  join + a map-side-partial ``sum(sigma)`` per (source, node) — the
  multi-source BFS shape of operators/bfs.py carrying Brandes's
  path-count ``sigma`` alongside the distance;
* backward sweep (≤ ``max_hops`` rounds, deepest level first):
  dependency accumulation over shortest-path DAG edges
  (dist_w = dist_v + 1), where each term is floored independently —

      contrib(v←w) = (sigma_v · (10^6 + delta_w)) div sigma_w
      delta_v      = Σ_w contrib(v←w)

  Per-term flooring makes the sum order-independent, so Spark, the
  Python twin and the DuckDB twin (:func:`betweenness_sql`, forward +
  backward rounds unrolled) agree bit for bit with zero floats; the
  floor error is < 10^-6 per term, folded into the DEFINED semantics.

``bc_micro(v) = Σ_s delta_s(v)`` over the sampled sources (v = s
excluded, Brandes's rule). Scaling to the full-graph estimate is the
caller's ``·V/k`` — left symbolic since V is known to them anyway.

State is O(k·V) pairs bounded by the horizon; every shuffle is keyed
on (source, node); eager localCheckpoint per round. Reference scope:
beyond the reference; no reference code consulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.hashing import hash60, hash60_sql

MICRO = 1_000_000


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k_sources: int = 8,
    max_hops: int = 4,
    sources: DataFrame | None = None,
) -> DataFrame:
    """``(node, bc_micro)`` — summed integer Brandes dependencies of
    every node over the sampled sources, within ``max_hops``."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = (
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if sources is None:
        if k_sources < 1:
            raise ValueError("k_sources must be >= 1")
        srcs = (
            nodes.withColumn("_h", hash60(F.col("node")))
            .orderBy("_h", "node")
            .limit(k_sources)
            .select(F.col("node").alias("s"))
        )
    else:
        srcs = sources.select(F.col(sources.columns[0]).alias("s"))
    srcs = srcs.localCheckpoint(eager=True)

    # forward: settled (s, node, dist, sigma)
    settled = srcs.select(
        "s",
        F.col("s").alias("node"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = settled
    for d in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        frontier = (
            cand.join(
                settled.select("s", F.col("node")),
                ["s", "node"],
                "left_anti",
            )
            .select("s", "node", F.lit(d).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        settled = settled.unionByName(frontier).localCheckpoint(
            eager=True
        )

    # backward: dependency accumulation level by level, deepest first
    delta = settled.select(
        "s", "node", "dist", F.lit(0).cast("bigint").alias("delta")
    )
    for d in range(max_hops - 1, -1, -1):
        # upper/lower/settled all share lineage (delta derives from
        # settled), so attribute-reference equality like
        # upper["s"] == lower["s"] can degenerate to the trivially-true
        # 's == 's self-comparison Spark warns about. Rename EVERY
        # joined column up front so the predicates are unambiguous by
        # construction (the _sw/_w2 pattern, applied to all three
        # sides).
        lower = delta.filter(F.col("dist") == d + 1).select(
            F.col("s").alias("_ls"),
            F.col("node").alias("_lw"),
            F.col("delta").alias("delta_w"),
        )
        upper = settled.filter(F.col("dist") == d).select(
            F.col("s").alias("_us"),
            F.col("node").alias("_un"),
            F.col("sigma").alias("_usigma"),
        )
        contrib = (
            upper.join(e, F.col("_un") == e["src"])
            .join(
                lower,
                (F.col("_us") == F.col("_ls"))
                & (e["dst"] == F.col("_lw")),
            )
            .join(
                settled.select(
                    F.col("s").alias("_sw"),
                    F.col("node").alias("_w2"),
                    F.col("sigma").alias("sigma_w"),
                ),
                (F.col("_us") == F.col("_sw"))
                & (e["dst"] == F.col("_w2")),
            )
            .select(
                F.col("_us").alias("s"),
                F.col("_un").alias("node"),
                F.expr(
                    f"(_usigma * ({MICRO} + delta_w)) div sigma_w"
                ).cast("bigint").alias("c"),
            )
            .groupBy("s", "node")
            .agg(F.sum("c").alias("d_new"))
        )
        delta = (
            delta.join(contrib, ["s", "node"], "left")
            .select(
                "s",
                "node",
                "dist",
                F.when(F.col("dist") == d, F.coalesce("d_new", F.lit(0)))
                .otherwise(F.col("delta"))
                .cast("bigint")
                .alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return (
        delta.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.sum("delta").cast("bigint").alias("bc_micro"))
    )


def betweenness_sql(
    edges_sql: str,
    k_sources: int = 8,
    max_hops: int = 4,
) -> str:
    """DuckDB twin: hash-sampled sources, ``max_hops`` forward rounds
    (sigma sums) and ``max_hops`` backward rounds (per-term-floored
    dependency accumulation) unrolled as materialized CTEs."""
    h = hash60_sql("node")
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src::VARCHAR AS src, "
        f"dst::VARCHAR AS dst FROM ({edges_sql}) WHERE src <> dst)",
        "nodes AS (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT dst FROM e)",
        f"""srcs AS MATERIALIZED (
    SELECT node AS s FROM (
        SELECT node, {h} AS hh FROM nodes
        ORDER BY hh, node LIMIT {k_sources}))""",
        "t0 AS MATERIALIZED (SELECT s, s AS node, 0 AS dist, "
        "1::BIGINT AS sigma FROM srcs)",
        "st0 AS MATERIALIZED (SELECT * FROM t0)",
    ]
    for d in range(1, max_hops + 1):
        parts.append(
            f"""t{d} AS MATERIALIZED (
    SELECT f.s, e.dst AS node, {d} AS dist, sum(f.sigma)::BIGINT AS sigma
    FROM t{d - 1} f JOIN e ON e.src = f.node
    WHERE NOT EXISTS (
        SELECT 1 FROM st{d - 1} p
        WHERE p.s = f.s AND p.node = e.dst)
    GROUP BY f.s, e.dst)"""
        )
        parts.append(
            f"st{d} AS MATERIALIZED (SELECT * FROM st{d - 1} "
            f"UNION ALL SELECT * FROM t{d})"
        )
    parts.append(
        f"d{max_hops} AS MATERIALIZED (SELECT s, node, dist, "
        f"0::BIGINT AS delta FROM st{max_hops})"
    )
    for d in range(max_hops - 1, -1, -1):
        parts.append(
            f"""d{d} AS MATERIALIZED (
    SELECT p.s, p.node, p.dist,
           CASE WHEN p.dist = {d} THEN coalesce(c.d_new, 0)
                ELSE p.delta END::BIGINT AS delta
    FROM d{d + 1} p
    LEFT JOIN (
        SELECT u.s, u.node,
               sum((u.sigma * ({MICRO} + w.delta)) // w2.sigma) AS d_new
        FROM st{max_hops} u
        JOIN e ON e.src = u.node
        JOIN d{d + 1} w ON w.s = u.s AND w.node = e.dst
                        AND w.dist = {d + 1}
        JOIN st{max_hops} w2 ON w2.s = u.s AND w2.node = e.dst
        WHERE u.dist = {d}
        GROUP BY u.s, u.node) c
    ON c.s = p.s AND c.node = p.node)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT node, sum(delta)::BIGINT AS bc_micro
FROM d0 WHERE dist > 0 GROUP BY node"""
    )


def betweenness_py(
    edge_list,
    k_sources: int = 8,
    max_hops: int = 4,
    sources: list | None = None,
):
    """Python twin (tests): identical sampling, sigma sums and
    per-term-floored backward accumulation."""
    from ..functions.hashing import hash60_py

    e = sorted({(str(a), str(b)) for a, b in edge_list if a != b})
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if sources is None:
        srcs = [n for n in sorted(nodes, key=lambda n: (hash60_py(n), n))][
            :k_sources
        ]
    else:
        srcs = [str(s) for s in sources]
    bc: dict = {}
    for s in srcs:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for d in range(1, max_hops + 1):
            nxt: dict = {}
            for v in frontier:
                for w in adj.get(v, ()):  # candidates
                    if w in dist:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            for w, sg in nxt.items():
                dist[w] = d
                sigma[w] = sg
            frontier = list(nxt)
            if not frontier:
                break
        delta = {v: 0 for v in dist}
        for d in range(max_hops - 1, -1, -1):
            for v in dist:
                if dist[v] != d:
                    continue
                total = 0
                for w in adj.get(v, ()):
                    if dist.get(w) == d + 1:
                        total += (sigma[v] * (MICRO + delta[w])) // sigma[w]
                delta[v] = total
        for v, dv in delta.items():
            if v != s:
                bc[v] = bc.get(v, 0) + dv
    return bc
