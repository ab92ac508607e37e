"""Deterministic maximal independent set (Luby's algorithm with
hash priorities) over an undirected edge DataFrame.

Why a training-data engine needs MIS: near-dup detection emits a PAIR
graph (minhash_lsh_pairs, semdedup, ppjoin...). ``near_dup_clusters``
resolves it by collapsing whole connected components to one survivor —
right when the pairs really are the same document. When pairs are only
*similar* (paraphrases, templated variants) component-collapse
over-deletes: a long similarity CHAIN a—b—c—d nukes everything but one
doc even though a and d are unrelated. The other classical policy is
an INDEPENDENT SET of the conflict graph: keep a maximal set of
documents no two of which are flagged similar — drop the minimum
needed so no surviving pair conflicts. MIS is that policy, and Luby's
algorithm is how it runs at 10^12 nodes.

Algorithm (deterministic Luby): every node gets the priority
``(hash60(node), node)`` — the portable md5 hash both engines
reproduce, with the node id as a total-order tiebreak. Per round, a
node still undecided joins the MIS iff its priority is smaller than
every undecided neighbor's; winners' neighbors are eliminated, and the
round repeats on the residual graph. With (pseudo)random priorities
the residual shrinks geometrically — O(log n) rounds w.h.p. (Luby
1986) — and a fixed hash makes the whole run reproducible, so the
DuckDB twin (:func:`mis_sql`, rounds unrolled as MATERIALIZED CTEs
with the identical row-tuple comparison) re-derives it value for
value.

Shape at scale (the components/kcore discipline):

* per round: ONE edge⋈active semi restriction + ONE map-side-partial
  ``min(struct(prio, node))`` aggregation over the live edges + two
  hash joins on node ids to subtract winners and their neighbors —
  shuffle keys are node ids, adjacency never materializes;
* eager ``localCheckpoint`` per round (O(1) lineage);
* convergence action is an O(1) count of the undecided set.

Self-loops are dropped (a node is not its own conflict); isolated
nodes join the MIS in round 1 (no neighbor outranks them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql


def _und(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(
        F.col(src).cast("string").alias("a"),
        F.col(dst).cast("string").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )


def maximal_independent_set(
    edges: DataFrame,
    src: str = "subject",
    dst: str = "object",
    max_rounds: int = 40,
) -> DataFrame:
    """``(node, in_mis, round)`` for every node in the edge list —
    ``in_mis`` 0/1 BIGINT, ``round`` the 1-based round the node was
    decided (winners and their eliminated neighbors decide in the same
    round). Deterministic for a fixed node universe."""
    und = _und(edges, src, dst).localCheckpoint(eager=True)
    nodes = und.select(F.col("a").alias("node")).distinct()
    active = nodes.withColumn("prio", hash60(F.col("node")))
    active = active.localCheckpoint(eager=True)
    decided = None
    for rnd in range(1, max_rounds + 1):
        # neighbor minimum over the ACTIVE subgraph
        live = (
            und.join(active.select(F.col("node").alias("a")), "a")
            .join(
                active.select(
                    F.col("node").alias("b"),
                    F.col("prio").alias("pb"),
                ),
                "b",
            )
        )
        nbr_min = live.groupBy("a").agg(
            F.min(F.struct(F.col("pb"), F.col("b"))).alias("m")
        )
        flagged = (
            active.join(nbr_min, active["node"] == nbr_min["a"], "left")
            .select(
                "node",
                "prio",
                F.when(
                    F.col("m").isNull()
                    | (
                        F.struct(F.col("prio"), F.col("node"))
                        < F.col("m")
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("win"),
            )
        )
        winners = flagged.filter(F.col("win") == 1).select("node")
        eliminated = (
            und.join(winners.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(active.select("node"), "node", "left_semi")
            .join(winners, "node", "left_anti")
        )
        round_decided = (
            winners.select(
                "node",
                F.lit(1).cast("long").alias("in_mis"),
                F.lit(rnd).cast("long").alias("round"),
            ).unionByName(
                eliminated.select(
                    "node",
                    F.lit(0).cast("long").alias("in_mis"),
                    F.lit(rnd).cast("long").alias("round"),
                )
            )
        ).localCheckpoint(eager=True)
        decided = (
            round_decided
            if decided is None
            else decided.unionByName(round_decided).localCheckpoint(
                eager=True
            )
        )
        active = (
            active.join(round_decided, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if active.isEmpty():
            break
    else:
        raise RuntimeError(
            f"MIS did not settle within {max_rounds} rounds"
        )
    return decided.select("node", "in_mis", "round")


def mis_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a maximal conflict-free subset of ``docs`` given a
    similarity pair graph ``(doc_a, doc_b)`` — docs absent from the
    pair graph survive untouched; of the conflicting ones, the MIS
    survives (maximal: adding any dropped doc would recreate a
    conflict)."""
    mis = maximal_independent_set(pairs, src="doc_a", dst="doc_b")
    drop = mis.filter(F.col("in_mis") == 0).select(
        F.col("node").alias("_drop")
    )
    return docs.join(
        drop, docs[id_col].cast("string") == drop["_drop"], "left_anti"
    )


def mis_sql(
    edges_sql: str, rounds: int, node_cast: str = "::VARCHAR"
) -> str:
    """DuckDB twin: rounds unrolled as MATERIALIZED CTEs — identical
    hash priority, row-tuple comparison and elimination rule. The
    caller picks ``rounds`` safely above the measured settle depth
    (monotone: extra rounds are no-ops on an empty active set)."""
    h = hash60_sql("node")
    parts = [
        f"""WITH mis_e0 AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT src{node_cast} AS a, dst{node_cast} AS b FROM ({edges_sql})
        UNION ALL
        SELECT dst{node_cast} AS a, src{node_cast} AS b FROM ({edges_sql}))
    WHERE a <> b),
act0 AS MATERIALIZED (
    SELECT node, {h} AS prio
    FROM (SELECT DISTINCT a AS node FROM mis_e0))"""
    ]
    selects = []
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""", win{r} AS MATERIALIZED (
    SELECT v.node, v.prio FROM act{p} v
    LEFT JOIN (
        SELECT e.a, min(ROW(u.prio, u.node)) AS m
        FROM mis_e0 e
        JOIN act{p} va ON va.node = e.a
        JOIN act{p} u ON u.node = e.b
        GROUP BY e.a) nm ON nm.a = v.node
    WHERE nm.m IS NULL OR ROW(v.prio, v.node) < nm.m)
, elim{r} AS MATERIALIZED (
    SELECT DISTINCT e.b AS node FROM mis_e0 e
    JOIN win{r} w ON w.node = e.a
    JOIN act{p} va ON va.node = e.b
    WHERE e.b NOT IN (SELECT node FROM win{r}))
, act{r} AS MATERIALIZED (
    SELECT * FROM act{p}
    WHERE node NOT IN (SELECT node FROM win{r})
      AND node NOT IN (SELECT node FROM elim{r}))"""
        )
        selects.append(
            f"SELECT node, 1::BIGINT AS in_mis, {r}::BIGINT AS round"
            f" FROM win{r}"
        )
        selects.append(
            f"SELECT node, 0::BIGINT AS in_mis, {r}::BIGINT AS round"
            f" FROM elim{r}"
        )
    union = "\nUNION ALL\n".join(selects)
    return "\n".join(parts) + f"\nSELECT * FROM (\n{union}\n)"


def mis_py(edge_list, max_rounds: int = 40):
    """Python twin over [(a, b), ...] string pairs (tests)."""
    from ..functions.hashing import hash60_py

    adj: dict = {}
    for a, b in edge_list:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    prio = {v: (hash60_py(v), v) for v in adj}
    out = {}
    rnd = 0
    while active:
        rnd += 1
        if rnd > max_rounds:
            raise RuntimeError("python twin did not settle")
        winners = {
            v
            for v in active
            if all(
                prio[v] < prio[u] for u in adj[v] if u in active
            )
        }
        eliminated = set()
        for w in winners:
            eliminated |= adj[w] & active
        eliminated -= winners
        for w in winners:
            out[w] = (1, rnd)
        for e in eliminated:
            out[e] = (0, rnd)
        active -= winners | eliminated
    return out
