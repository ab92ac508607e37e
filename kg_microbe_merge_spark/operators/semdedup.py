"""SemDeDup — semantic deduplication via embedding clusters (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The embedding-space member of the dedup family: exact dedup catches
byte-identical documents, MinHash/SimHash catch lexical near-dups, and
SemDeDup catches *semantic* duplicates (paraphrases, boilerplate
rewrites, translations re-crawled) that share almost no n-grams. The
recipe: k-means-cluster the embeddings, compare pairs only WITHIN a
cluster, connect pairs above a cosine threshold, keep one survivor per
connected group.

Composition of already-verified machinery — each stage keeps its own
scale story:

1. **Cluster** — :func:`.kmeans.kmeans_assignments`: literal-centroid
   zero-shuffle assignment, bounded-shuffle Lloyd updates.
2. **Candidate pairs** — a self-join on the cluster id: O(Σ cᵢ²)
   instead of the O(N²) all-pairs scan (the whole point of SemDeDup —
   with balanced clusters the cost drops by ~k×, and the join is a
   plain hash join on a small int key, never a cross join). Unit
   vectors are computed once per row (:func:`.similarity
   .normalized_vectors`) and the pair filter keeps only
   ``cosine ≥ threshold``, so the post-join stream collapses
   immediately to the near-dup edge set.
3. **Resolve** — distributed connected components over the pair graph
   (large-star/small-star, :mod:`.components`) and min-id survivors:
   transitive chains land in ONE group with one survivor, exactly like
   :func:`.dedup.near_dup_clusters`.

Determinism / oracle parity: k-means assignments are deterministic
(hash60 init, round-6 distances), cosines are rounded to 6 decimals
before the threshold compare, survivors are min-ids — the DuckDB twin
in ``__spark_entry__`` replays cluster assignment with the unrolled
Lloyd CTEs, the within-cluster pair join relationally, and the
connectivity with a recursive CTE.

Caveat (documented, same as the paper): near-dups straddling a cluster
boundary are missed — that is the approximation SemDeDup trades for
the k× cost cut; raise ``k`` slowly or run a second pass with a
different seed to tighten recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_assignments
from .similarity import dot_expr, normalized_vectors


def _pairs_from_assignment(
    vectors: DataFrame,
    assigned: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Within-cluster pair join against a precomputed (vec_id, cluster)
    assignment — shared by :func:`semantic_dedup_pairs` and
    :func:`semantic_dedup` so clustering runs exactly once."""
    normed = normalized_vectors(vectors, id_col, vec_col, "vec_id", "_v")
    clustered = normed.join(assigned, "vec_id")
    a = clustered.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_a"),
        F.col("_v").alias("_va"),
    )
    b = clustered.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_b"),
        F.col("_v").alias("_vb"),
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(dot_expr(F.col("_va"), F.col("_vb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cluster", "cosine")
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster cosine near-dup pairs:
    ``(id_a, id_b, cluster, cosine)`` with ``id_a < id_b`` and
    ``cosine ≥ threshold`` (rounded to 6 decimals first)."""
    assigned = kmeans_assignments(
        vectors, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    return _pairs_from_assignment(
        vectors, assigned, threshold, id_col, vec_col
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full SemDeDup decision for EVERY vector:
    ``(vec_id, cluster, canonical_id, kept)`` — ``canonical_id`` is the
    min id of the vector's near-dup group (itself when it has no
    in-cluster near-dup), ``kept`` marks the survivor."""
    from .components import connected_components

    # cluster ONCE and checkpoint: the assignment feeds both the pair
    # join and the final output, and kmeans itself is iterative
    assigned = kmeans_assignments(
        vectors, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=False)
    pairs = _pairs_from_assignment(
        vectors, assigned, threshold, id_col, vec_col
    )
    # materialize the (tiny) pair graph once: CC consumes it from two
    # lineages and would otherwise replay clustering + pairing twice
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint(eager=False)
    comp = connected_components(edges).select(
        F.col("node").alias("vec_id"), F.col("component")
    )
    return (
        assigned.join(comp, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("component"), F.col("vec_id")).alias(
                "canonical_id"
            ),
            (
                F.coalesce(F.col("component"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("kept"),
        )
    )
