"""Deterministic random walks over the KG edge table (DeepWalk /
node2vec corpus generation).

Graph-embedding pipelines (DeepWalk, node2vec, PinSage-style) start by
materializing a walk corpus: for every start node, a length-k walk
whose every step picks one neighbor "at random". At 10^9+ nodes the
naive formulation — join the frontier with the edge table and sample
among the candidate rows — explodes on hubs: a 10^8-degree node
multiplies every walk that touches it by its full adjacency before
sampling. This module uses the **rank-join** formulation, which is
1:1 per step and therefore skew-proof at walk time:

1. preprocess the edge table ONCE: per-source neighbor rank
   (``row_number() over (partition by src order by dst)``) and degree —
   persisted and reused by every step of every walk;
2. each step is two 1:1-bounded joins: positions ⋈ degree (compute
   ``r = hash(walk_id:step) % degree + 1``), then positions ⋈ ranked
   edges on ``(node, rank=r)`` — **exactly one matching row per walk**,
   no candidate explosion, regardless of hub degree;
3. k steps = k such joins, each a hash join on the partitioning the
   ranked-edge table already carries; walk rows are O(n_walks),
   independent of |E|.

The per-source ranking window is the one place a Zipf hub concentrates
work (one task ranks the full adjacency of the hottest source); at
extreme degree, cap adjacency first (``max_degree`` hash-samples
neighbors row-locally BEFORE the window — standard DeepWalk degree
capping, and it bounds the window partition too).

Determinism: the "randomness" is the portable md5 hash of
``walk_id:step`` (``functions/hashing.py``), so the same corpus is
reproduced bit-for-bit by Spark re-runs (speculative tasks safe), by
the DuckDB oracle (the gate unrolls k steps as chained CTEs), and by
the python twin in tests.

Reference parity: not in the reference (no graph algorithms there);
this extends the engine's graph family (components / BFS / PageRank /
triangles / k-core) with the embedding-preprocessing workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60


def ranked_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Preprocess: (src, dst, rnk, deg) with rnk 1..deg dense per
    source, deterministic (ordered by dst). ``max_degree`` caps hub
    adjacencies BEFORE the ranking window via the portable hash —
    row-local, deterministic, keeps the window partition bounded."""
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.distinct()
    if max_degree is not None:
        # keep the max_degree neighbors with the smallest hash(src:dst)
        keyed = e.withColumn(
            "_hk", hash60(F.concat_ws(":", F.col("src"), F.col("dst")))
        )
        w = Window.partitionBy("src").orderBy("_hk", "dst")
        e = (
            keyed.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_degree)
            .drop("_hk", "_r")
        )
    w = Window.partitionBy("src").orderBy("dst")
    ranked = e.withColumn("rnk", F.row_number().over(w))
    deg = ranked.groupBy("src").agg(F.max("rnk").alias("deg"))
    return ranked.join(deg, "src")


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 3,
    src: str = "src",
    dst: str = "dst",
    start_col: str = "id",
    seed: str = "walk",
    max_degree: int | None = None,
) -> DataFrame:
    """Length-``steps`` deterministic walks from every row of
    ``starts``. Returns (walk_id, step, node): step 0 is the start
    node; a walk ends early at a sink (no outgoing edges).

    Each step is two hash joins bounded 1:1 per live walk — hub
    degree never multiplies rows (see module docstring)."""
    re_df = ranked_edges(edges, src=src, dst=dst, max_degree=max_degree)
    # persist the reused relations so k steps don't recompute the
    # ranking window (reliable checkpoint / intermediate table on a
    # real cluster), then release them before returning — the result
    # is eagerly localCheckpoint-ed each step, so the returned plan
    # holds no reference to the caches (same pattern as bfs/pagerank)
    re_df = re_df.persist()
    deg_df = re_df.select("src", "deg").distinct().persist()

    pos = starts.select(
        F.col(start_col).cast("string").alias("walk_id"),
        F.col(start_col).cast("string").alias("node"),
    )
    out = pos.withColumn("step", F.lit(0)).localCheckpoint(eager=True)
    for t in range(1, steps + 1):
        step_hash = hash60(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(t)), F.lit(seed))
        )
        # 1:1 per walk: degree lookup first, so the rank is a LEFT-side
        # expression and the edge join is a two-key equi-join on
        # (src, rnk) — a hub's adjacency never multiplies walk rows
        withr = (
            pos.join(deg_df, pos["node"] == deg_df["src"])
            .select(
                "walk_id",
                "node",
                ((step_hash % F.col("deg")) + 1).alias("r"),
            )
        )
        nxt = withr.join(
            re_df,
            (withr["node"] == re_df["src"]) & (withr["r"] == re_df["rnk"]),
        ).select(
            "walk_id", F.col("dst").alias("node")
        ).localCheckpoint(eager=True)
        out = out.unionByName(nxt.withColumn("step", F.lit(t)))
        pos = nxt
    re_df.unpersist()
    deg_df.unpersist()
    return out.select("walk_id", F.col("step").cast("int"), "node")


def random_walks_sql(
    edges_sql: str,
    starts_sql: str,
    steps: int = 3,
    seed: str = "walk",
) -> str:
    """DuckDB twin of :func:`random_walks` (no max_degree): k steps
    unrolled as chained CTEs over the same ranked-edge relation and the
    same portable hash. ``edges_sql`` must yield (src, dst),
    ``starts_sql`` one column ``id``."""

    def h(expr: str) -> str:
        return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "ranked AS (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY dst) AS rnk FROM e)",
        "deg AS (SELECT src, max(rnk) AS deg FROM ranked GROUP BY src)",
        f"w0 AS (SELECT CAST(id AS VARCHAR) AS walk_id, "
        f"CAST(id AS VARCHAR) AS node FROM ({starts_sql}))",
    ]
    unions = ["SELECT walk_id, 0 AS step, node FROM w0"]
    for t in range(1, steps + 1):
        hexpr = h(f"w{t - 1}.walk_id || ':{t}:{seed}'")
        ctes.append(
            f"w{t} AS (SELECT w{t - 1}.walk_id, ranked.dst AS node "
            f"FROM w{t - 1} "
            f"JOIN deg ON deg.src = w{t - 1}.node "
            f"JOIN ranked ON ranked.src = w{t - 1}.node "
            f"AND ranked.rnk = ({hexpr} % deg.deg) + 1)"
        )
        unions.append(f"SELECT walk_id, {t} AS step, node FROM w{t}")
    body = "\n        UNION ALL ".join(unions)
    return (
        "WITH " + ",\n        ".join(ctes) + "\n        SELECT walk_id, "
        "CAST(step AS INTEGER) AS step, node FROM (" + body + ")"
    )


def skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """(center, context, n) skip-gram training pairs from a walk corpus
    (what DeepWalk/node2vec feed to word2vec): every ordered pair of
    walk positions within ``window`` steps, aggregated to counts.

    Shape at scale: one self-join on ``walk_id`` — bounded 1:(steps+1)
    per row because a walk is a small constant length, so no key can
    explode; the count aggregation is map-side partial. Walk corpora
    are O(n_walks·steps) rows — tiny next to the edge table they came
    from."""
    a = walks.select(
        "walk_id",
        F.col("step").alias("s_c"),
        F.col("node").alias("center"),
    )
    b = walks.select(
        "walk_id",
        F.col("step").alias("s_x"),
        F.col("node").alias("context"),
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.abs(F.col("s_c") - F.col("s_x")) <= window)
            & (F.col("s_c") != F.col("s_x"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def walks_py(edges: list[tuple], starts: list, steps: int = 3, seed: str = "walk"):
    """Python twin (tests): same ranked-neighbor + hash protocol."""
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    adj: dict = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in starts:
        node = str(start)
        rows.append((node, 0, node))
        for t in range(1, steps + 1):
            nbrs = adj.get(node)
            if not nbrs:
                break
            r = hash60_py(f"{start}:{t}:{seed}") % len(nbrs)
            node = nbrs[r]
            rows.append((str(start), t, node))
    return rows
