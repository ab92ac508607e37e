"""Product quantization (PQ) for billion-scale ANN: train per-subspace
codebooks, encode vectors to m small codes, and answer top-k queries
with asymmetric distance computation (ADC).

The compression ladder in this repo: brute cosine (guarded baseline,
:mod:`.similarity`) → sign-LSH / IVF (bucketed candidates) → SQ8
(:mod:`.quantize`, 4× storage cut) → **PQ** (this module, the
Jégou/Douze/Schmid construction): the vector is split into ``m``
subspaces, each quantized independently with its own k-means codebook,
so storage is ``m`` code bytes per vector (32× for dim=32, m=4 over
float64) and query distance is a sum of ``m`` table lookups — the
standard memory/recall trade at 10^12 rows, and the cell layout IVF
composes with (IVF-PQ).

Spark shape (every stage keeps the big table's work row-local):

* **train** — per Lloyd round, ONE job assigns every subspace (the
  current codebooks are literal arrays; per-subspace argmin is a
  row-local fold over ``F.slice`` of the vector, the
  :mod:`.kmeans` discipline) and aggregates per
  ``(subspace, cluster, pos)`` means map-side — the shuffle is
  O(partitions · k · dim), independent of N; the k·dim means round-trip
  the driver as literals for the next round.
* **encode** — zero shuffle: m row-local argmin folds → ``array<int>``.
* **ADC top-k** — the query's m×k distance table is computed
  DRIVER-side (tiny), inlined as literal arrays; each row's score is
  ``Σ_j table_j[code_j]`` — m ``element_at`` lookups, no join, no
  Python, one bounded ``TakeOrderedAndProject``.

Determinism (the repo convention): codebook init per subspace is the
``k`` sub-vectors of the rows with smallest ``hash60(id)`` (ties by
id); every cross-engine float (distances, means, scores) is rounded to
6 decimals; distance ties break to the smallest code. Pure-Python
twins (``pq_*_py``) mirror the arithmetic for value-level tests.

Reference parity: the reference has no vector operators; this extends
the mandated similarity-search family (SURVEY.md §2 additions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def _sub_dist2(sub: Column, centroid: list[float]) -> Column:
    """round(Σ (x-c)², 6) over one subspace slice vs a literal."""
    return F.round(
        F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(float(c)) for c in centroid]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _slice(vec: Column, j: int, sub_dim: int) -> Column:
    return F.slice(vec, j * sub_dim + 1, sub_dim)


def _code(vec: Column, j: int, sub_dim: int, book: list[list[float]]) -> Column:
    """Row-local argmin code for subspace j (ties → smallest code)."""
    sub = _slice(vec, j, sub_dim)
    scores = F.array(
        *[
            F.struct(_sub_dist2(sub, c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(book)
        ]
    )
    return F.sort_array(scores)[0]["cid"]


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``k`` centroids each; returns
    ``codebooks[j][c] = centroid c of subspace j`` (driver-side lists,
    m·k·dim/m doubles — literals, not data)."""
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if dim is None:
        first = v.select(F.size("_v")).first()
        if first is None:
            raise ValueError("cannot train PQ on an empty table")
        dim = first[0]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m

    init = (
        v.select(
            "vec_id", "_v", hash60(F.col("vec_id").cast("string")).alias("_h")
        )
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"need ≥ k={k} vectors to init, have {len(init)}")
    books = [
        [list(r["_v"])[j * sub_dim : (j + 1) * sub_dim] for r in init]
        for j in range(m)
    ]

    for _ in range(iterations - 1):
        # ONE job for all subspaces: explode (subspace, code, pos, val)
        # and take partially-aggregated means
        coded = v.select(
            "_v",
            *[
                _code(F.col("_v"), j, sub_dim, books[j]).alias(f"c{j}")
                for j in range(m)
            ],
        )
        exploded = coded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.col(f"c{j}").alias("cluster"),
                            _slice(F.col("_v"), j, sub_dim).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("e")
        ).select(
            "e.sub", "e.cluster", F.posexplode("e.sv").alias("pos", "val")
        )
        means = (
            exploded.groupBy("sub", "cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("mval"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["sub"], r["cluster"]), {})[r["pos"]] = r["mval"]
        books = [
            [
                [got[(j, c)][p] for p in range(sub_dim)]
                if (j, c) in got
                else books[j][c]  # empty cell keeps its centroid
                for c in range(k)
            ]
            for j in range(m)
        ]
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes: array<int>)`` — zero-shuffle row-local encode."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    return v.select(
        "vec_id",
        F.array(
            *[_code(F.col("_v"), j, sub_dim, codebooks[j]) for j in range(m)]
        ).alias("codes"),
    )


def pq_topk(
    encoded: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: ``(vec_id, dist2)`` for the ``k``
    nearest by approximate squared L2 (dist asc, id asc). The m×k
    query-to-centroid table is driver-computed and inlined — each row
    pays m array lookups and one bounded top-k."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    if len(query) != m * sub_dim:
        raise ValueError(f"query dim {len(query)} != {m * sub_dim}")
    # driver-side ADC table pinned with the floor-micro rule (Python's
    # round() is banker's — not the engines' HALF_UP)
    tables = [
        [
            _micro6(_sum_sq_py(query[j * sub_dim : (j + 1) * sub_dim], c))
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    dist = F.lit(0.0)
    for j in range(m):
        dist = dist + F.get(
            F.array(*[F.lit(d) for d in tables[j]]),
            F.element_at("codes", j + 1),
        )
    dist = F.round(dist, 6)
    return (
        encoded.select(F.col(id_col), dist.alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )


def train_coarse_centroids(
    vectors: DataFrame,
    n_cells: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[float]]:
    """Full-dimension coarse quantizer for IVF — exactly PQ training
    with one subspace (m=1): k-means over whole vectors, hash60 init,
    round-6 means."""
    return train_pq_codebooks(
        vectors, m=1, k=n_cells, iterations=iterations,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )[0]


def write_pq_index(
    vectors: DataFrame,
    index_dir: str,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index as parquet PARTITIONED BY the
    coarse cell: ``index_dir/cell=<c>/`` holds ``(vec_id, codes)`` for
    that cell's members. Cell assignment and PQ encode are both
    row-local literal folds — the only exchange is the write itself,
    and the layout is what makes queries sublinear: a probe reads
    ``n_probe`` directories and Spark's partition pruning never lists
    the rest (plan-asserted in tests). This is the IVF-PQ file layout
    (the :mod:`.layout` Z-order idea applied to vector search)."""
    dim = len(coarse[0])
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    assert m * sub_dim == dim
    cell = _code(F.col("_v"), 0, dim, coarse)
    enc = v.select(
        "vec_id",
        F.array(
            *[_code(F.col("_v"), j, sub_dim, codebooks[j]) for j in range(m)]
        ).alias("codes"),
        cell.alias("cell"),
    )
    enc.write.mode("overwrite").partitionBy("cell").parquet(index_dir)


def probe_cells(
    query: list[float], coarse: list[list[float]], n_probe: int
) -> list[int]:
    """The ``n_probe`` nearest coarse cells for a query (driver-side —
    the coarse table is n_cells × dim literals, never data)."""
    scored = sorted(
        (( _micro6(_sum_sq_py(query, c)), i) for i, c in enumerate(coarse))
    )
    return [i for _, i in scored[:n_probe]]


def ivf_pq_topk(
    spark,
    index_dir: str,
    query: list[float],
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF-PQ search: read ONLY the ``n_probe`` nearest cell partitions
    of the :func:`write_pq_index` layout (partition pruning — the scan
    lists n_probe directories out of n_cells) and ADC-score the codes
    within. With n_cells ≈ √N cells this touches O(N·n_probe/n_cells)
    rows per query — the sublinear ANN read path at 10^12 rows."""
    cells = probe_cells(query, coarse, n_probe)
    idx = spark.read.parquet(index_dir).filter(F.col("cell").isin(cells))
    return pq_topk(idx, query, codebooks, k=k)


def pq_topk_sql(
    m: int = 4,
    k_centroids: int = 4,
    iterations: int = 2,
    k: int = 10,
    query_id: int = 0,
    d: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of train → encode → :func:`pq_topk` with the query
    being row ``query_id``'s raw vector (the :mod:`.quantize` gate
    convention — no float literals cross engines). The oracle retrains
    the codebooks itself (hash60 init, per-subspace Lloyd rounds with
    round-6 means, ties to the smallest code), so a gate match verifies
    the full train+encode+search pipeline. CTE chain mirrors the kmeans
    oracle, instantiated once per subspace."""
    sub = d // m
    assert sub * m == d

    def dist(vexpr: str, cexpr: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({vexpr}, {cexpr}), "
            "s -> (s[1] - s[2]) * (s[1] - s[2]))), 6)"
        )

    ctes = [
        f"v AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v "
        f"FROM {table})",
        f"""init AS (
            SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v
            FROM (SELECT vec_id, v,
                         ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT
                             AS h
                  FROM v)
            ORDER BY h, vec_id LIMIT {k_centroids})""",
    ]
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(
            f"c0_{j} AS (SELECT cid, v[{lo}:{hi}] AS cv FROM init)"
        )
        for t in range(1, iterations + 1):
            ctes.append(f"""
        a{t}_{j} AS (
            SELECT vec_id, sv, cid AS cluster FROM (
                SELECT t.vec_id, t.v[{lo}:{hi}] AS sv, c.cid,
                       row_number() OVER (
                           PARTITION BY t.vec_id
                           ORDER BY {dist(f"t.v[{lo}:{hi}]", "c.cv")}, c.cid
                       ) AS rn
                FROM v t CROSS JOIN c{t - 1}_{j} c)
            WHERE rn = 1)""")
            if t < iterations:
                ctes.append(f"""
        m{t}_{j} AS (
            SELECT cluster AS cid, i, round(avg(sv[i]), 6) AS mv
            FROM a{t}_{j}, range(1, {sub + 1}) r(i)
            GROUP BY cluster, i),
        c{t}_{j} AS (
            SELECT p.cid, coalesce(mm.cv, p.cv) AS cv
            FROM c{t - 1}_{j} p LEFT JOIN (
                SELECT cid, list(mv ORDER BY i) AS cv
                FROM m{t}_{j} GROUP BY cid) mm ON p.cid = mm.cid)""")
        # query-slice distance to each FINAL centroid (the ADC table);
        # floor-micro here, matching the operator's driver-side table
        ctes.append(f"""
        qd_{j} AS (
            SELECT c.cid,
                   CAST(floor(list_sum(list_transform(
                       list_zip(q.v[{lo}:{hi}], c.cv),
                       s -> (s[1] - s[2]) * (s[1] - s[2])))
                       * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS qdist
            FROM c{iterations - 1}_{j} c
            CROSS JOIN (SELECT v FROM v WHERE vec_id = {query_id}) q)""")

    joins = f"a{iterations}_0 a0 JOIN qd_0 q0 ON a0.cluster = q0.cid"
    for j in range(1, m):
        joins += (
            f" JOIN a{iterations}_{j} a{j} ON a{j}.vec_id = a0.vec_id"
            f" JOIN qd_{j} q{j} ON a{j}.cluster = q{j}.cid"
        )
    total = "0.0" + "".join(f" + q{j}.qdist" for j in range(m))
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
        scored AS (
            SELECT a0.vec_id, round({total}, 6) AS dist2
            FROM {joins})
        SELECT vec_id, dist2 FROM scored
        ORDER BY dist2 ASC, vec_id ASC LIMIT {k}"""
    )


# ---- pure-Python twins (tests) ----------------------------------------
# Same LEFT-FOLD accumulation order as the Spark aggregate expressions,
# not fsum — the twins must reproduce the operator bit-for-bit.


def _sum_sq_py(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s = s + (x - y) * (x - y)
    return s


def _micro6(x: float) -> float:
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _dist2_py(a: list[float], b: list[float]) -> float:
    return round(_sum_sq_py(a, b), 6)


def pq_encode_py(
    vec: list[float], codebooks: list[list[list[float]]]
) -> list[int]:
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    codes = []
    for j in range(m):
        sub = vec[j * sub_dim : (j + 1) * sub_dim]
        best = min(
            range(len(codebooks[j])),
            key=lambda c: (_dist2_py(sub, codebooks[j][c]), c),
        )
        codes.append(best)
    return codes


def pq_adc_py(
    codes: list[int],
    query: list[float],
    codebooks: list[list[list[float]]],
) -> float:
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    total = 0.0
    for j in range(m):
        total = total + _micro6(
            _sum_sq_py(
                query[j * sub_dim : (j + 1) * sub_dim],
                codebooks[j][codes[j]],
            )
        )
    return round(total, 6)
