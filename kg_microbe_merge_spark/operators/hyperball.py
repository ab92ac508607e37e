"""HyperBall: per-node neighborhood-size estimation at every radius.

The distance-distribution machine for web-scale graphs (Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall", 2013 —
the algorithm behind the "four degrees of separation" Facebook
measurement): give every node an HLL sketch seeded with itself, then
iterate ``sketch(v) ← merge(sketch(v), sketch(u) for u → v)``; after
``t`` rounds the sketch estimates ``|B(v, t)|``, the number of nodes
within distance ≤ t. From one run you read off the neighborhood
function N(t) = Σ_v |B(v,t)|, the effective diameter, and
closeness/harmonic centralities — quantities whose exact computation
is all-pairs BFS (O(n·m), hopeless at 10^12 edges), while HyperBall is
O(t) rounds of register merging.

Scale notes
-----------
* Registers live as ``m`` INT COLUMNS, not rows (the simhash
  64-column precedent): the per-round shuffle ships ONE row per edge
  (m small ints wide) into a ``groupBy(node).agg(max per column)``
  that partially aggregates map-side — never edges × m register rows
  (the row-form blowup the column layout exists to avoid).
* Per round: one equi-join (edges × sketches) + one partial-agg max
  — the exact shuffle discipline of components.py/pagerank.py; eager
  ``localCheckpoint`` per round truncates lineage.
* The estimate is row-local arithmetic over the m columns: the HLL
  integer protocol of operators/sketches.py — z = Σ_j 2^(Rmax - r_j)
  summed as BIGINT (an empty register's r_j = 0 contributes exactly
  the 2^Rmax the zeros term would), ONE int64→double division against
  a repr-exact numerator literal, micro-snapped. Relative error
  ~1.04/sqrt(m).
* The neighborhood function sums the per-node micro ints — exact
  BIGINT arithmetic, order-independent.

Oracle: :func:`hyperball_sql` generates a DuckDB twin in the ROW form
(node, reg, rho) with rounds unrolled as materialized CTEs — an
independent formulation of the same recurrence (row max-merge vs
column max), sharing only the hash/estimate constants.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60, hash60_sql
from kg_microbe_merge_spark.operators.sketches import _hll_alpha

#: default precision: m = 128 registers -> rel. error ~9.2%; raise p
#: for tighter balls (cost is linear in m)
HB_P = 7


def _sym_edges(edges: DataFrame, src: str, dst: str, directed: bool) -> DataFrame:
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s") != F.col("d")
    )
    if not directed:
        e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    return e.distinct()


def _initial_sketches(nodes: DataFrame, p: int) -> DataFrame:
    """Seed each node's sketch with itself: register reg(h) holds
    rho(h), every other register 0 (empty)."""
    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    h = hash60(F.col("node").cast("string"))
    reg = F.shiftright(h, reg_bits).cast("int")
    w = h.bitwiseAND(F.lit((1 << reg_bits) - 1))
    rho = (
        F.when(w == 0, F.lit(r_max))
        .otherwise(F.lit(r_max) - F.length(F.bin(w)))
        .cast("int")
    )
    cols = [
        F.when(reg == j, rho).otherwise(F.lit(0)).cast("int").alias(f"r{j}")
        for j in range(m)
    ]
    return nodes.select("node", *cols)


def _estimate_cols(p: int):
    """(zeros, z_scaled, est_micro) expressions from the m register
    columns — the sketches.py integer protocol, row-local. ``zeros``
    and ``z_scaled`` ride along (the hll_estimate convention) so
    consumers can apply the small-range linear-counting correction
    driver-side (:func:`hll_corrected_estimate_py` — it needs ``ln``,
    which is why the cross-engine column is the RAW estimate; raw HLL
    reads ~alpha·m for tiny balls)."""
    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    terms = [
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - r{j})")
        for j in range(m)
    ]
    z = reduce(lambda a, b: a + b, terms).cast("long")
    zero_terms = [
        F.when(F.col(f"r{j}") == 0, F.lit(1)).otherwise(F.lit(0))
        for j in range(m)
    ]
    zeros = reduce(lambda a, b: a + b, zero_terms).cast("long")
    numerator = _hll_alpha(m) * m * m * float(1 << r_max)
    est = F.lit(numerator) / z.cast("double")
    est_micro = F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long")
    return zeros, z, est_micro


def hyperball(
    edges: DataFrame,
    max_t: int,
    src: str = "subject",
    dst: str = "object",
    directed: bool = False,
    p: int = HB_P,
) -> DataFrame:
    """Ball-size estimates ``(node, t, zeros BIGINT, z_scaled BIGINT,
    est_micro BIGINT, est DOUBLE)`` for every node and every radius
    t = 0..max_t (``zeros``/``z_scaled`` let consumers apply the
    small-range linear-counting correction driver-side via
    ``sketches.hll_corrected_estimate_py`` — raw HLL reads ~alpha·m on
    tiny balls).

    ``est`` ≈ |B(node, t)|, the number of distinct nodes within
    distance ≤ t (including the node itself; t=0 estimates 1 up to
    sketch noise — with a single element the HLL raw estimator is
    deterministic per register constants).
    """
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    m = 1 << p
    rcols = [f"r{j}" for j in range(m)]
    # loop-invariant: persist so each round's join (and the eager
    # checkpoint actions driving them) reuses one materialization
    # instead of re-running the symmetrize+distinct shuffle per round
    # (the bfs/pagerank discipline); safe to release at the end —
    # every snapshot is a projection over a checkpointed sketch table
    e = _sym_edges(edges, src, dst, directed).persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    sk = _initial_sketches(nodes, p).localCheckpoint(eager=True)
    zeros, z_scaled, est_micro = _estimate_cols(p)

    def _snapshot(s, t):
        return s.select(
            "node",
            F.lit(t).alias("t"),
            zeros.alias("zeros"),
            z_scaled.alias("z_scaled"),
            est_micro.alias("est_micro"),
        )

    snapshots = [_snapshot(sk, 0)]
    for t in range(1, max_t + 1):
        # merge each node's sketch with its OUT-neighbors' sketches:
        # after t rounds sketch(v) covers {u : dist(v -> u) <= t}, the
        # out-ball (closeness convention); undirected inputs are
        # symmetrized so the distinction vanishes there
        nbr = e.join(sk, e["d"] == sk["node"]).select(
            F.col("s").alias("node"), *rcols
        )
        sk = (
            sk.select("node", *rcols)
            .union(nbr)
            .groupBy("node")
            .agg(*[F.max(c).alias(c) for c in rcols])
        ).localCheckpoint(eager=True)
        snapshots.append(_snapshot(sk, t))
    e.unpersist()
    out = reduce(lambda a, b: a.union(b), snapshots)
    return out.select(
        "node",
        F.col("t").cast("int").alias("t"),
        "zeros",
        "z_scaled",
        "est_micro",
        (F.col("est_micro") / F.lit(1e6)).alias("est"),
    )


def neighborhood_function(balls: DataFrame) -> DataFrame:
    """N(t) = Σ_v |B(v, t)| from a :func:`hyperball` result:
    ``(t, nf_micro BIGINT)`` — exact BIGINT sum of the per-node micro
    estimates (order-independent)."""
    return (
        balls.groupBy("t")
        .agg(F.sum("est_micro").cast("long").alias("nf_micro"))
        .orderBy("t")
    )


def effective_diameter_py(nf: Sequence[tuple[int, int]], alpha: float = 0.9):
    """Interpolated effective diameter from (t, nf_micro) pairs: the
    smallest x with N(x) ≥ alpha·N(∞) (driver-side helper; linear
    interpolation between integer radii, the HyperANF convention)."""
    pts = sorted(nf)
    total = pts[-1][1]
    target = alpha * total
    prev_t, prev_v = pts[0]
    if prev_v >= target:
        return float(prev_t)
    for t, v in pts[1:]:
        if v >= target:
            return prev_t + (target - prev_v) / (v - prev_v) * (t - prev_t)
        prev_t, prev_v = t, v
    return float(pts[-1][0])


def hyperball_sql(base_edges: str, max_t: int, p: int = HB_P) -> str:
    """DuckDB twin of :func:`hyperball` over ``base_edges`` (a query
    with columns ``s, d``, already oriented; the twin symmetrizes and
    dedups like the Spark path with ``directed=False``). ROW-form
    recurrence — (node, reg, rho) max-merge rounds unrolled as
    materialized CTEs — independent of the Spark column layout."""
    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    numerator = repr(_hll_alpha(m) * m * m * float(1 << r_max))
    h = hash60_sql("node::VARCHAR")
    ctes = [
        f"""raw AS (SELECT s, d FROM ({base_edges}) WHERE s <> d),
        e AS (SELECT DISTINCT s, d FROM
              (SELECT s, d FROM raw UNION ALL SELECT d, s FROM raw)),
        nodes AS (SELECT DISTINCT s AS node FROM e
                  UNION SELECT d FROM e),
        r0 AS MATERIALIZED (
            SELECT node,
                   ({h} >> {reg_bits})::INT AS reg,
                   (CASE WHEN ({h} & {(1 << reg_bits) - 1}) = 0
                         THEN {r_max}
                         ELSE {r_max} - length(bin({h} & {(1 << reg_bits) - 1}))
                    END)::INT AS rho
            FROM nodes)"""
    ]
    for t in range(1, max_t + 1):
        prev = f"r{t - 1}"
        ctes.append(
            f"""r{t} AS MATERIALIZED (
            SELECT node, reg, max(rho) AS rho FROM (
                SELECT e.s AS node, r.reg, r.rho
                FROM {prev} r JOIN e ON e.d = r.node
                UNION ALL SELECT node, reg, rho FROM {prev})
            GROUP BY node, reg)"""
        )
    selects = [
        f"""SELECT node, {t} AS t,
            ({m} - count(*))::BIGINT AS zeros,
            (sum(1::BIGINT << ({r_max} - rho))
             + ({m} - count(*)) * (1::BIGINT << {r_max}))::BIGINT
                AS z_scaled
        FROM r{t} GROUP BY node"""
        for t in range(0, max_t + 1)
    ]
    union = "\n        UNION ALL\n        ".join(selects)
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined},
        balls AS ({union})
        SELECT node, t::INT AS t, zeros, z_scaled,
               floor({numerator} / z_scaled::DOUBLE * 1e6 + 0.5)::BIGINT
                   AS est_micro,
               floor({numerator} / z_scaled::DOUBLE * 1e6 + 0.5)::BIGINT
                   / 1e6 AS est
        FROM balls
    """
