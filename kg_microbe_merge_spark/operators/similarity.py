"""Similarity search over embedding columns (``array<float>``).

- :func:`brute_force_cosine_topk` — exact top-k neighbors; the
  correctness baseline. JVM-side dot product via ``zip_with`` +
  ``aggregate`` (no Python).
- :func:`lsh_cosine_topk` — random-hyperplane (sign-LSH) bucketed
  variant: the 100 TB path. Each vector hashes to a B-bit signature from
  deterministic pseudo-random hyperplanes; candidates share a signature
  bucket (multi-probe via multiple independent tables); exact cosine
  re-ranks within candidates.

Scale notes: brute force is O(Q·N) and only for small Q (it broadcasts
the query set); the LSH variant's cost is Σ bucket², tuned by bits/
tables. Both keep the big side un-shuffled until candidate join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (cast upstream)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast against ``vectors`` (huge); ranking
    is a per-query window over the scored join. Self-matches (same id)
    are excluded. Output: (query_id, vec_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("vv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("vv")), 6))
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, bit: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is a
    hash-derived value in [-1, 1). Pure function of (table, bit, j) — the
    same plane on every executor with no driver-side RNG state."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.sha256(f"{table}:{bit}:{j}".encode()).digest()
        comps.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
    return comps


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """B-bit sign signature of ``vec`` against the given hyperplanes."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot_expr(vec, F.array(*[F.lit(c) for c in plane]))
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Both sides get ``tables`` independent B-bit signatures; candidates
    are pairs sharing (table, signature); exact cosine re-ranks. Recall
    is tuned by (bits↓, tables↑). Output schema matches the brute-force
    variant.
    """
    all_planes = [
        [_hyperplane(dim, b, t) for b in range(bits)] for t in range(tables)
    ]

    def with_sigs(df: DataFrame, idc: str, out_id: str, out_vec: str) -> DataFrame:
        d = df.select(
            F.col(idc).alias(out_id), _as_double(F.col(vec_col)).alias(out_vec)
        )
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    signature_expr(F.col(out_vec), all_planes[t]).alias("sig"),
                )
                for t in range(tables)
            ]
        )
        return d.select(out_id, out_vec, F.explode(sigs).alias("ts")).select(
            out_id, out_vec, F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig")
        )

    v = with_sigs(vectors, id_col, "vec_id", "vv")
    q = with_sigs(queries, query_id_col, "query_id", "qv")
    cand = (
        v.join(q.hint("broadcast"), ["table", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qv", "vv")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("qv"), F.col("vv")), 6)
    ).select("query_id", "vec_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
