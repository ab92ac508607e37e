"""DBSCAN-style density clustering over a similarity pair relation.

The embedding-space clustering member of the dedup/similarity family:
where SemDeDup (operators/semdedup.py) collapses near-duplicate GROUPS
to one survivor, density clustering asks the structural question —
which regions of embedding space are dense (topics, template
families, boilerplate clusters) and which points are isolated noise.
Classic DBSCAN roles over a precomputed eps-neighbor pair graph:

* **core**: a point with at least ``min_pts`` neighbors in the pair
  relation;
* **border**: a non-core point adjacent to some core — joins that
  core's cluster;
* **noise**: everything else (cluster NULL).

Clusters are connected components over CORE–CORE edges (min-id
canonical labels via ``operators/components.connected_components`` —
large-star/small-star, the same machinery as same_as
canonicalization), so density-reachability is honored exactly: border
points never chain clusters together. Classic DBSCAN leaves border
assignment order-dependent when a border point touches two clusters;
this engine pins the MINIMUM core-neighbor cluster label
(deterministic, the repo's min-id convention — documented deviation).

The pair relation comes from any of the engine's candidate
generators — SemDeDup's kmeans-cell-bounded cosine pairs
(:func:`..semdedup.semantic_dedup_pairs`), MinHash/LSH buckets, or
ANN top-k — so "eps" is whatever similarity floor produced the pairs.
Neighborhoods are therefore bounded by the generator (never
all-pairs), and every shuffle below is keyed on point ids or
(point, 1) degree rows — map-side combinable, hub-safe.

Reference scope: beyond the reference; no reference code consulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components


def dbscan_from_pairs(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    min_pts: int = 3,
) -> DataFrame:
    """``(point, role, cluster)`` for every point in the pair
    relation. ``role`` in ('core', 'border', 'noise'); ``cluster`` is
    the min core id of the density cluster (NULL for noise).
    ``min_pts`` counts NEIGHBORS (the point itself excluded) —
    equivalent to scikit-learn's ``min_samples = min_pts + 1``."""
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    sym = (
        pairs.select(
            F.col(a_col).cast("string").alias("a"),
            F.col(b_col).cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    sym = (
        sym.unionByName(
            sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.filter(F.col("deg") >= min_pts).select(
        F.col("a").alias("node")
    ).localCheckpoint(eager=True)
    core_edges = (
        sym.join(core.select(F.col("node").alias("a")), "a", "left_semi")
        .join(core.select(F.col("node").alias("b")), "b", "left_semi")
    )
    cc = connected_components(core_edges, src="a", dst="b")
    # isolated cores (no core neighbor) are their own singleton cluster
    core_lab = (
        core.join(cc, "node", "left")
        .select(
            "node", F.coalesce("component", "node").alias("cluster")
        )
        .localCheckpoint(eager=True)
    )
    core_rows = core_lab.select(
        F.col("node").alias("point"),
        F.lit("core").alias("role"),
        "cluster",
    )
    noncore = deg.select(F.col("a").alias("node")).join(
        core, "node", "left_anti"
    )
    # border: min cluster label among core neighbors (deterministic)
    border_lab = (
        sym.join(noncore.select(F.col("node").alias("a")), "a", "left_semi")
        .join(
            core_lab.select(
                F.col("node").alias("b"), F.col("cluster")
            ),
            "b",
        )
        .groupBy(F.col("a").alias("point"))
        .agg(F.min("cluster").alias("cluster"))
    )
    border_rows = border_lab.select(
        "point", F.lit("border").alias("role"), "cluster"
    )
    noise_rows = (
        noncore.join(
            border_lab.select(F.col("point").alias("node")),
            "node",
            "left_anti",
        )
        .select(
            F.col("node").alias("point"),
            F.lit("noise").alias("role"),
            F.lit(None).cast("string").alias("cluster"),
        )
    )
    return core_rows.unionByName(border_rows).unionByName(noise_rows)


def dbscan_sql(pairs_sql: str, min_pts: int = 3) -> str:
    """DuckDB twin over a pair relation with columns (id_a, id_b):
    identical degree/core rule, recursive-CTE min-id connectivity over
    core–core edges, and the min-cluster border pinning."""
    return f"""
        WITH RECURSIVE
        rawp AS MATERIALIZED (SELECT id_a, id_b FROM ({pairs_sql})),
        sym AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
                SELECT id_a::VARCHAR AS a, id_b::VARCHAR AS b FROM rawp
                UNION ALL
                SELECT id_b::VARCHAR, id_a::VARCHAR FROM rawp)
            WHERE a <> b),
        deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a),
        core AS MATERIALIZED (
            SELECT a AS node FROM deg WHERE deg >= {min_pts}),
        ce AS MATERIALIZED (
            SELECT s.a, s.b FROM sym s
            JOIN core x ON x.node = s.a
            JOIN core y ON y.node = s.b),
        walk(node, comp) AS (
            SELECT node, node FROM (SELECT DISTINCT a AS node FROM ce)
            UNION
            SELECT e.b, w.comp FROM walk w JOIN ce e ON e.a = w.node),
        cc AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node),
        core_lab AS MATERIALIZED (
            SELECT c.node, coalesce(cc.comp, c.node) AS cluster
            FROM core c LEFT JOIN cc ON cc.node = c.node),
        noncore AS (
            SELECT a AS node FROM deg
            WHERE a NOT IN (SELECT node FROM core)),
        border AS MATERIALIZED (
            SELECT s.a AS point, min(cl.cluster) AS cluster
            FROM sym s
            JOIN noncore n ON n.node = s.a
            JOIN core_lab cl ON cl.node = s.b
            GROUP BY s.a)
        SELECT node AS point, 'core' AS role, cluster FROM core_lab
        UNION ALL
        SELECT point, 'border', cluster FROM border
        UNION ALL
        SELECT node, 'noise', NULL FROM noncore
        WHERE node NOT IN (SELECT point FROM border)
    """
