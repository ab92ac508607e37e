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


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 3,
    w_return: int = 250_000,
    w_near: int = 1_000_000,
    w_far: int = 500_000,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    start_col: str = "id",
    seed: str = "n2v",
    max_degree: int | None = None,
) -> DataFrame:
    """Second-order (node2vec) biased walks by deterministic rejection
    sampling — the KnightKing formulation, which keeps every step two
    1:1 joins per live walk (skew-proof) instead of materializing
    per-edge alias tables (O(E·avg_deg) state, hopeless at 10^12
    edges).

    Bias weights are node2vec's α with integer micro weights (no
    floats, cross-engine exact): stepping from ``cur`` (having arrived
    from ``prev``), a uniformly ranked candidate ``x`` carries

    * ``w_return`` if ``x == prev``            (α = 1/p),
    * ``w_near``   if ``(prev, x)`` is an edge (α = 1),
    * ``w_far``    otherwise                   (α = 1/q),

    and is ACCEPTED iff ``hash(walk:t:r:acc) % w_max < w``. Up to
    ``rounds`` rejection rounds run per step; walks still undecided
    after the last round take that round's candidate (a small uniform
    admixture of ≤ (1 − E[w]/w_max)^rounds per step — the documented,
    deterministic truncation of the unbounded rejection loop; with
    default weights and rounds=3 it is ≈2%% of steps). The first step
    has no ``prev`` and is uniform, per the node2vec definition.

    Cost: each round is the two rank-join lookups of
    :func:`random_walks` plus ONE (prev, x) edge-membership left join
    — all 1:1-bounded per pending walk, and the pending set shrinks
    geometrically across rounds.

    Returns (walk_id, step, node) like :func:`random_walks`.
    """
    if not (w_return > 0 and w_near > 0 and w_far > 0):
        raise ValueError("bias weights must be positive")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    w_max = max(w_return, w_near, w_far)
    re_df = ranked_edges(edges, src=src, dst=dst, max_degree=max_degree)
    re_df = re_df.persist()
    deg_df = re_df.select("src", "deg").distinct().persist()
    # (a, b) membership relation for the distance-1 test — the FULL
    # edge set (not degree-capped): bias classification is about the
    # real graph even when sampling caps hub adjacency
    e_set = (
        edges.select(F.col(src).alias("_ms"), F.col(dst).alias("_md"))
        .distinct()
        .withColumn("_is_near", F.lit(True))
        .persist()
    )

    pos = starts.select(
        F.col(start_col).cast("string").alias("walk_id"),
        F.col(start_col).cast("string").alias("node"),
        F.lit(None).cast("string").alias("prev"),
    )
    # out accumulates as a PLAIN union of per-step checkpointed pos
    # frames — checkpointing the union itself would re-materialize all
    # accumulated rows every step (O(steps²) copies, one extra job per
    # step) for layers that are already materialized
    out = pos.select("walk_id", F.lit(0).alias("step"), "node")
    for t in range(1, steps + 1):
        pending = pos
        nxt = None
        for r in range(1, rounds + 1):
            step_hash = hash60(
                F.concat_ws(
                    ":", F.col("walk_id"), F.lit(str(t)), F.lit(str(r)),
                    F.lit(seed),
                )
            )
            cand = (
                pending.join(deg_df, pending["node"] == deg_df["src"])
                .select(
                    "walk_id", "node", "prev",
                    ((step_hash % F.col("deg")) + 1).alias("_r"),
                )
            )
            cand = cand.join(
                re_df,
                (cand["node"] == re_df["src"]) & (cand["_r"] == re_df["rnk"]),
            ).select(
                "walk_id", "prev", F.col("node").alias("_cur"),
                F.col("dst").alias("cand"),
            )
            cand = cand.join(
                e_set,
                (cand["prev"] == e_set["_ms"]) & (cand["cand"] == e_set["_md"]),
                "left",
            ).select(
                "walk_id", "prev", "_cur", "cand",
                F.when(F.col("prev").isNull(), F.lit(w_max))  # first step
                .when(F.col("cand") == F.col("prev"), F.lit(w_return))
                .when(F.col("_is_near"), F.lit(w_near))
                .otherwise(F.lit(w_far))
                .alias("_w"),
            )
            acc_hash = hash60(
                F.concat_ws(
                    ":", F.col("walk_id"), F.lit(str(t)), F.lit(str(r)),
                    F.lit("acc"), F.lit(seed),
                )
            )
            accept = (acc_hash % F.lit(w_max)) < F.col("_w")
            take = F.lit(r == rounds) | accept
            # no per-round checkpoint of the accepted rows: they are
            # materialized once by the per-step pos checkpoint below
            # (the pending checkpoint already bounds lineage; within a
            # step the union stays ≤ rounds layers deep)
            step_rows = cand.filter(take).select(
                "walk_id",
                F.col("_cur").alias("prev"),
                F.col("cand").alias("node"),
            )
            nxt = step_rows if nxt is None else nxt.unionByName(step_rows)
            if r < rounds:
                pending = (
                    cand.filter(~take)
                    .select("walk_id", F.col("_cur").alias("node"), "prev")
                    .localCheckpoint(eager=True)
                )
        pos = nxt.select("walk_id", "node", "prev").localCheckpoint(
            eager=True
        )
        out = out.unionByName(
            pos.select("walk_id", F.lit(t).alias("step"), "node")
        )
    re_df.unpersist()
    deg_df.unpersist()
    e_set.unpersist()
    return out.select("walk_id", F.col("step").cast("int"), "node")


def node2vec_walks_py(
    edges: list[tuple],
    starts: list,
    steps: int = 3,
    w_return: int = 250_000,
    w_near: int = 1_000_000,
    w_far: int = 500_000,
    rounds: int = 3,
    seed: str = "n2v",
):
    """Python twin of :func:`node2vec_walks` (tests + oracle sanity):
    identical ranked-neighbor order, hash draws, rejection protocol and
    last-round fallback."""
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    w_max = max(w_return, w_near, w_far)
    eset = set(edges)
    adj: dict = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in starts:
        node, prev = str(start), None
        rows.append((node, 0, node))
        for t in range(1, steps + 1):
            nbrs = adj.get(node)
            if not nbrs:
                break
            chosen = None
            for r in range(1, rounds + 1):
                c = nbrs[hash60_py(f"{start}:{t}:{r}:{seed}") % len(nbrs)]
                if prev is None:
                    w = w_max
                elif c == prev:
                    w = w_return
                elif (prev, c) in eset:
                    w = w_near
                else:
                    w = w_far
                acc = hash60_py(f"{start}:{t}:{r}:acc:{seed}") % w_max < w
                if acc or r == rounds:
                    chosen = c
                    break
            prev, node = node, chosen
            rows.append((str(start), t, node))
    return rows


def node2vec_walks_sql(
    edges_sql: str,
    starts_sql: str,
    steps: int = 3,
    w_return: int = 250_000,
    w_near: int = 1_000_000,
    w_far: int = 500_000,
    rounds: int = 3,
    seed: str = "n2v",
) -> str:
    """DuckDB twin of :func:`node2vec_walks` (no max_degree): steps ×
    rejection rounds unrolled as chained CTEs — identical ranked
    relation, hash draws, CASE weight order and last-round fallback."""
    from kg_microbe_merge_spark.functions.hashing import hash60_sql

    w_max = max(w_return, w_near, w_far)
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "ranked AS (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY dst) AS rnk FROM e)",
        "deg AS (SELECT src, max(rnk) AS deg FROM ranked GROUP BY src)",
        f"p0_0 AS (SELECT CAST(id AS VARCHAR) AS walk_id, "
        f"CAST(id AS VARCHAR) AS node, CAST(NULL AS VARCHAR) AS prev "
        f"FROM ({starts_sql}))",
    ]
    unions = ["SELECT walk_id, 0 AS step, node FROM p0_0"]
    prev_cte = "p0_0"
    for t in range(1, steps + 1):
        acc_parts = []
        pend = prev_cte
        for r in range(1, rounds + 1):
            draw = hash60_sql(f"p.walk_id || ':{t}:{r}:{seed}'")
            ctes.append(
                f"c{t}_{r} AS (SELECT p.walk_id, p.prev, "
                f"p.node AS cur, ranked.dst AS cand, "
                f"CASE WHEN p.prev IS NULL THEN {w_max} "
                f"WHEN ranked.dst = p.prev THEN {w_return} "
                f"WHEN m.src IS NOT NULL THEN {w_near} "
                f"ELSE {w_far} END AS w "
                f"FROM {pend} p "
                f"JOIN deg ON deg.src = p.node "
                f"JOIN ranked ON ranked.src = p.node "
                f"AND ranked.rnk = ({draw} % deg.deg) + 1 "
                f"LEFT JOIN e m ON m.src = p.prev AND m.dst = ranked.dst)"
            )
            acc = hash60_sql(f"walk_id || ':{t}:{r}:acc:{seed}'")
            cond = "TRUE" if r == rounds else f"{acc} % {w_max} < w"
            ctes.append(
                f"a{t}_{r} AS (SELECT walk_id, cur AS prev, cand AS node "
                f"FROM c{t}_{r} WHERE {cond})"
            )
            acc_parts.append(f"SELECT walk_id, node, prev FROM a{t}_{r}")
            if r < rounds:
                ctes.append(
                    f"p{t}_{r} AS (SELECT walk_id, cur AS node, prev "
                    f"FROM c{t}_{r} WHERE NOT ({acc} % {w_max} < w))"
                )
                pend = f"p{t}_{r}"
        ctes.append(f"w{t} AS ({' UNION ALL '.join(acc_parts)})")
        unions.append(f"SELECT walk_id, {t} AS step, node FROM w{t}")
        prev_cte = f"w{t}"
    body = "\n        UNION ALL ".join(unions)
    return (
        "WITH " + ",\n        ".join(ctes) + "\n        SELECT walk_id, "
        "CAST(step AS INTEGER) AS step, node FROM (" + body + ")"
    )
