"""Deterministic random projection (Johnson–Lindenstrauss) of embedding
columns — the dimensionality-reduction front end of every scale ANN /
clustering recipe (project 64→8 dims before LSH/IVF/k-means, then
re-rank the short candidate list in full precision).

The projection matrix is a ±1 sign matrix derived from the repo's
portable md5 hash (``functions/hashing.py``): entry m[j][i] is +1 iff
``hash60("<seed>:<j>:<i>")`` is even. A ±1 matrix scaled by 1/√k is
the classic Achlioptas JL construction (database-friendly: no Gaussian
sampling, exact arithmetic), and deriving it from the shared hash means
the DuckDB oracle can inline the SAME matrix as literals — the gate
verifies values, not just shapes.

Shape at scale:

- ZERO shuffle, ZERO Python: each output dim is a chained
  multiply-add over the vector elements, whole-stage-codegen JVM-side
  inside the scan stage (same pattern as the k-means literal-centroid
  assignment);
- the matrix is k·d literals baked into the plan (k=8, d=64 → 512
  terms) — nothing is broadcast, nothing is joined;
- float protocol: terms are combined strictly left-to-right in BOTH
  engines (identical IEEE operation sequence → bit-identical doubles),
  then pinned with ``floor(x·1e6 + 0.5)/1e6`` — no round-half-mode
  ambiguity, safe to hash-compare.

For multi-thousand-dim embeddings prefer the ``mapInPandas`` GEMM in
``operators/similarity.py`` (one numpy matmul per Arrow batch); the
codegen path here is the right trade below a few hundred dims.

Reference parity: not in the reference (no vector types there); part
of the mandated similarity-search family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60_py


def projection_signs(k: int, d: int, seed: str = "proj") -> list[list[int]]:
    """The ±1 JL sign matrix, reproducible in SQL/python/Spark."""
    return [
        [1 if hash60_py(f"{seed}:{j}:{i}") % 2 == 0 else -1 for i in range(d)]
        for j in range(k)
    ]


def random_projection(
    df: DataFrame,
    k: int = 8,
    d: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "proj",
) -> DataFrame:
    """Project ``vec_col`` (array<float>, length ``d``) onto ``k``
    deterministic ±1/√k hyperplanes. Returns (id_col, p0..p{k-1})
    with each coordinate pinned to 6 decimals via the floor protocol."""
    signs = projection_signs(k, d, seed)
    inv_sqrt_k = 1.0 / math.sqrt(k)
    out = [F.col(id_col)]
    for j in range(k):
        acc = None
        for i in range(d):
            e = F.element_at(F.col(vec_col), i + 1).cast("double")
            t = e if signs[j][i] > 0 else -e
            acc = t if acc is None else acc + t
        p = F.floor(
            acc * F.lit(inv_sqrt_k) * F.lit(1000000.0) + F.lit(0.5)
        ) / F.lit(1000000.0)
        out.append(p.alias(f"p{j}"))
    return df.select(*out)


def random_projection_sql(
    k: int = 8,
    d: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "proj",
) -> str:
    """DuckDB twin of :func:`random_projection` — same sign literals,
    same left-to-right operation order, same floor protocol."""
    signs = projection_signs(k, d, seed)
    inv_sqrt_k = repr(1.0 / math.sqrt(k))
    cols = []
    for j in range(k):
        terms = []
        for i in range(d):
            e = f"CAST({vec_col}[{i + 1}] AS DOUBLE)"
            terms.append(e if signs[j][i] > 0 else f"(- {e})")
        chain = " + ".join(terms)
        cols.append(
            f"CAST(floor(({chain}) * {inv_sqrt_k} * 1000000.0 + 0.5) "
            f"AS BIGINT) / 1000000.0 AS p{j}"
        )
    sel = ",\n               ".join(cols)
    return f"SELECT {id_col},\n               {sel}\n        FROM {table}"


def project_py(vec, k: int = 8, seed: str = "proj") -> list[float]:
    """Python twin (tests): project one vector with the same protocol."""
    d = len(vec)
    signs = projection_signs(k, d, seed)
    inv_sqrt_k = 1.0 / math.sqrt(k)
    out = []
    for j in range(k):
        acc = 0.0
        first = True
        for i in range(d):
            t = float(vec[i]) if signs[j][i] > 0 else -float(vec[i])
            acc = t if first else acc + t
            first = False
        out.append(math.floor(acc * inv_sqrt_k * 1000000.0 + 0.5) / 1000000.0)
    return out
