"""Scalar (int8-range) quantization of embedding columns + quantized
top-k search — the storage/compute half of a 100 TB vector pipeline.

At 10^12 documents a float32 embedding column is the single largest
table in the lake (64 dims × 4 B = 256 B/row → ~256 TB); per-dimension
scalar quantization to one byte cuts that 4× with bounded recall loss,
and candidate scoring can run entirely in INTEGER arithmetic on the
codes (asymmetric-distance style), reserving float re-ranking for the
short list. This module is the exact distributed formulation:

- **train** = one aggregation producing per-dimension min/max (2·d
  values, partially aggregated map-side — a metrics-sized result);
- **encode** = row-local: ``code_i = clamp(floor((v_i - mn_i)·s_i +
  0.5), 0, 255)`` with ``s_i = 255/(mx_i - mn_i)``, all literals baked
  into the plan (zero shuffle, zero Python, whole-stage codegen);
- **search** = integer dot products over codes (EXACT — no float
  accumulation), cosine from integer dot/norms with a single final
  sqrt, one TakeOrdered top-k (no global sort).

Cross-engine exactness (the reason this can be value-hash gated): the
code arithmetic uses ``floor(x + 0.5)`` (no round-half ambiguity), the
dot/norms are integers, and the only float ops (scale, cosine) are the
same IEEE operation sequence in Spark and DuckDB. The oracle recomputes
min/max itself — it verifies the training step too, not just encoding.

Reference parity: not in the reference (no vector types); part of the
mandated similarity-search family alongside brute/LSH/IVF in
``operators/similarity.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_minmax(
    df: DataFrame, d: int = 64, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — ONE aggregation job,
    2·d outputs. The result is model state (like k-means centroids or
    LSH planes): a driver-side literal list, broadcast into the encode
    plan as constants."""
    aggs = []
    for i in range(d):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs.append(F.min(e).alias(f"mn{i}"))
        aggs.append(F.max(e).alias(f"mx{i}"))
    row = df.agg(*aggs).collect()[0]
    mn = [row[f"mn{i}"] for i in range(d)]
    mx = [row[f"mx{i}"] for i in range(d)]
    return mn, mx


def _scales(mn: list[float], mx: list[float]) -> list[float]:
    return [
        (255.0 / (hi - lo)) if hi > lo else 0.0 for lo, hi in zip(mn, mx)
    ]


def sq8_encode(
    df: DataFrame,
    mn: list[float],
    mx: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """Row-local encode: (id_col, code array<int> length d). All
    constants inlined — the plan is scan → project, no exchange."""
    scales = _scales(mn, mx)
    codes = []
    for i, (lo, s) in enumerate(zip(mn, scales)):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        q = F.floor((e - F.lit(lo)) * F.lit(s) + F.lit(0.5))
        codes.append(
            F.least(F.greatest(q, F.lit(0)), F.lit(255)).cast("int")
        )
    return df.select(F.col(id_col), F.array(*codes).alias(code_col))


def sq8_topk(
    df: DataFrame,
    query_id,
    k: int = 20,
    d: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mn: list[float] | None = None,
    mx: list[float] | None = None,
) -> DataFrame:
    """Top-``k`` neighbors of ``query_id`` by quantized cosine.

    Returns (id_col, qdot BIGINT, qcos DOUBLE, rank INT) excluding the
    query row, total order (qcos desc, id asc). ``qdot`` and the code
    norms are exact integers; ``qcos`` follows the floor protocol.
    The query side is one broadcast row — the corpus is scanned once,
    scored row-locally, and reduced with a TakeOrdered top-k."""
    if mn is None or mx is None:
        mn, mx = train_minmax(df, d=d, vec_col=vec_col)
    codes = sq8_encode(df, mn, mx, vec_col=vec_col, id_col=id_col)
    # the query code is model state like mn/mx: ONE collected row,
    # inlined as literals — no broadcast join, and its self-dot (a
    # per-query constant) is computed once driver-side instead of
    # re-folded for every corpus row
    qrows = codes.filter(F.col(id_col) == F.lit(query_id)).collect()
    if not qrows:
        return codes.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("qdot"),
            F.lit(None).cast("double").alias("qcos"),
            F.lit(None).cast("int").alias("rank"),
        ).limit(0)
    qcode = list(qrows[0]["code"])
    nq = sum(c * c for c in qcode)
    rest = codes.filter(F.col(id_col) != F.lit(query_id))

    qdot = F.aggregate(
        F.zip_with(
            F.col("code"),
            F.array(*[F.lit(c) for c in qcode]),
            lambda x, y: (x * y).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nv = F.aggregate(
        F.zip_with(
            F.col("code"), F.col("code"), lambda x, y: (x * y).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = rest.select(
        F.col(id_col),
        qdot.alias("qdot"),
        nv.alias("nv"),
    ).select(
        id_col,
        "qdot",
        F.when(
            (F.col("nv") > 0) & (F.lit(nq) > 0),
            F.floor(
                F.col("qdot")
                / F.sqrt((F.col("nv") * F.lit(nq)).cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0),
        ).alias("qcos"),
    )
    ranked = scored.orderBy(
        F.col("qcos").desc(), F.col(id_col).asc()
    ).limit(k)
    # rank materialized over the k survivors only (bounded single
    # partition — k rows, not the corpus)
    w = Window.orderBy(F.col("qcos").desc(), F.col(id_col).asc())
    return ranked.select(
        id_col,
        "qdot",
        "qcos",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def sq8_topk_sql(
    query_id: int = 0,
    k: int = 20,
    d: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`sq8_topk`. Recomputes min/max itself (so
    the gate verifies the TRAIN step, not just encoding), then the same
    floor-protocol encode, exact integer dot/norms, and the same total
    (qcos desc, id asc) order."""
    mmx = ", ".join(
        f"min(CAST({vec_col}[{i + 1}] AS DOUBLE)) AS mn{i}, "
        f"max(CAST({vec_col}[{i + 1}] AS DOUBLE)) AS mx{i}"
        for i in range(d)
    )
    code_elems = ", ".join(
        f"least(greatest(CAST(floor((CAST({vec_col}[{i + 1}] AS DOUBLE) "
        f"- mn{i}) * (CASE WHEN mx{i} > mn{i} THEN 255.0 / (mx{i} - mn{i}) "
        f"ELSE 0.0 END) + 0.5) AS BIGINT), 0), 255)"
        for i in range(d)
    )
    rng = f"range(1, {d + 1})"
    return f"""
        WITH mmx AS (SELECT {mmx} FROM {table}),
        codes AS (
            SELECT {id_col}, [{code_elems}] AS code
            FROM {table} CROSS JOIN mmx),
        q AS (SELECT code AS qcode FROM codes WHERE {id_col} = {query_id}),
        scored AS (
            SELECT c.{id_col},
                   CAST(list_sum(list_transform({rng},
                        i -> c.code[i] * q.qcode[i])) AS BIGINT) AS qdot,
                   CAST(list_sum(list_transform({rng},
                        i -> c.code[i] * c.code[i])) AS BIGINT) AS nv,
                   CAST(list_sum(list_transform({rng},
                        i -> q.qcode[i] * q.qcode[i])) AS BIGINT) AS nq
            FROM codes c CROSS JOIN q
            WHERE c.{id_col} <> {query_id}),
        cosd AS (
            SELECT {id_col}, qdot,
                   CASE WHEN nv > 0 AND nq > 0 THEN
                        CAST(floor(qdot / sqrt(CAST(nv * nq AS DOUBLE))
                                   * 1000000.0 + 0.5) AS BIGINT)
                        / 1000000.0
                   END AS qcos
            FROM scored),
        r AS (
            SELECT *, row_number() OVER (ORDER BY qcos DESC, {id_col} ASC)
                   AS rank
            FROM cosd)
        SELECT {id_col}, qdot, qcos, CAST(rank AS INTEGER) AS rank
        FROM r WHERE rank <= {k}
    """


def sq8_reconstruct_py(
    code: list[int], mn: list[float], mx: list[float]
) -> list[float]:
    """Python twin (tests): decode a code back to the bucket center."""
    out = []
    for c, lo, hi in zip(code, mn, mx):
        if hi > lo:
            out.append(lo + c * (hi - lo) / 255.0)
        else:
            out.append(lo)
    return out


def sq8_encode_py(
    vec, mn: list[float], mx: list[float]
) -> list[int]:
    """Python twin of :func:`sq8_encode` for one vector."""
    scales = _scales(mn, mx)
    return [
        max(0, min(255, int(math.floor((float(v) - lo) * s + 0.5))))
        for v, lo, s in zip(vec, mn, scales)
    ]
