"""KMV (bottom-k / theta) distinct sketches with set-INTERSECTION
estimation.

The missing capability in the HLL half of the sketch family
(operators/sketches.py): HLL answers "how many distinct x per group"
but cannot answer "how many distinct x do groups A and B SHARE" —
inclusion–exclusion over two HLL estimates subtracts two large noisy
numbers and the relative error on the intersection explodes whenever
the overlap is small (exactly the interesting case in corpus audits:
token/url/entity overlap between crawl snapshots, contamination
surface between train and eval shards, shared-vocabulary mass between
sources). The KMV / bottom-k sketch (Bar-Yossef et al. 2002; the
DataSketches "theta sketch" family) fixes this structurally: the
sketch IS a uniform sample of the hashed item space — the k smallest
distinct 60-bit hashes — so set algebra happens on the samples
themselves before estimating, and the intersection estimate inherits
the union's relative error (~1/sqrt(k-2)) instead of compounding it.

Estimators (all over the portable md5-derived ``hash60``, hash space
R = 2^60):

* distinct:      n̂ = (k-1) · R / h_(k)     (exact count when < k seen)
* union:         bottom-k of the merged hash arrays, same estimator
* intersection:  n̂_∩ = |S_∪ ∩ A ∩ B| / |S_∪| · n̂_∪  — the fraction of
  the union sample present in both sketches, scaled by the union size
* Jaccard:       |S_∪ ∩ A ∩ B| / |S_∪| directly (a true sample mean)

Scale notes
-----------
* ONE exchange builds a sketch: a ``dense_rank() ≤ k`` window ordered
  by the hash runs as WindowGroupLimit with a map-side Partial pass
  (the cap_per_source precedent — plan-asserted in tests), so at most
  the k smallest distinct hashes per group survive each map partition
  before shuffling; the final per-group array is built from ≤
  k·n_partitions rows, never the item universe.
* Sketches are a SEMIGROUP under :func:`kmv_merge` (union arrays →
  distinct → sort → truncate k): partials combine across partitions,
  snapshots, and streaming micro-batches; the merge is idempotent
  (replay-safe, like the HLL register max).
* Set operations are row-local array algebra over ≤ k-element arrays
  (``array_distinct`` / ``array_sort`` / ``filter`` / ``slice``) after
  a 1:1 join on the group key — no per-item shuffle ever happens again
  once the sketches exist.

Cross-engine exactness: everything is BIGINT until the single final
division per estimate — numerators like (k-1)·2^60 carry ≤ log2(k)
significant bits and are emitted as repr-exact double literals, the
division operand order is mirrored verbatim in the module-generated
DuckDB twin, and results snap to the repo's floor(x·1e6 + 0.5) micro
protocol (the hll_sql precedent: oracle generated from the same
constants, so engine and twin cannot drift).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60, hash60_sql

#: default sketch size: rel. error ~ 1/sqrt(254) = 6.3% on union/distinct
KMV_K = 256

#: size of the hash60 space (60-bit md5 prefix)
HASH_SPACE = 1 << 60


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: Sequence[str] = (),
    k: int = KMV_K,
) -> DataFrame:
    """Per-group bottom-k sketch ``(*group_cols, hs ARRAY<BIGINT>)`` —
    the k smallest distinct ``hash60`` values of ``item_col``,
    ascending.

    The ``dense_rank`` window runs as WindowGroupLimit: each map
    partition forwards at most the k smallest distinct hashes per
    group (plus in-partition duplicates of those survivors), so the
    one exchange is k-bounded regardless of item cardinality. With no
    ``group_cols`` the final limit runs in a single task over ≤
    k·n_partitions pre-limited rows — the global top-k shape, bounded
    but serialized; prefer grouped sketches at scale.
    """
    h = hash60(F.col(item_col).cast("string"))
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("h")
    ranked = (
        df.select(*group_cols, h.alias("h"))
        .withColumn("_rn", F.dense_rank().over(w))
        .filter(F.col("_rn") <= k)
    )
    return ranked.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str] = (), k: int = KMV_K
) -> DataFrame:
    """Merge two sketch tables: sketch(A ∪ B) — union arrays, distinct,
    sort, truncate to k. Row-local after a full-outer 1:1 join on the
    group key; idempotent (re-merging a delta is a no-op)."""
    empty = F.array().cast("array<bigint>")
    bj = b.withColumnRenamed("hs", "_hs_b")
    if group_cols:
        j = a.join(bj, list(group_cols), "full_outer")
    else:
        j = a.crossJoin(bj)
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("hs"), empty),
                    F.coalesce(F.col("_hs_b"), empty),
                )
            )
        ),
        1,
        k,
    )
    return j.select(*group_cols, merged.alias("hs"))


def _estimate_expr(hs, k: int):
    """Micro-int distinct estimate from a sketch array: exact size when
    the sketch is unsaturated, else (k-1)·R/h_(k). The numerator has ≤
    log2(k) significant bits — repr-exact as a double literal."""
    numerator = float((k - 1) * HASH_SPACE)
    n = F.size(hs)
    est = F.when(
        n < k, n.cast("double")
    ).otherwise(F.lit(numerator) / F.element_at(hs, k).cast("double"))
    return F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long")


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str] = (), k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimates from a sketch table:
    ``(*group_cols, n_sample BIGINT, est_micro BIGINT, est DOUBLE)``."""
    est_micro = _estimate_expr(F.col("hs"), k)
    return sketch.select(
        *group_cols,
        F.size("hs").cast("long").alias("n_sample"),
        est_micro.alias("est_micro"),
        (est_micro / F.lit(1e6)).alias("est"),
    )


def kmv_intersection(
    a: DataFrame,
    b: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = KMV_K,
) -> DataFrame:
    """Set-overlap estimates between two sketch tables (inner-joined
    1:1 on the group key): ``(*group_cols, n_a, n_b, n_union_sample,
    matches, union_est_micro, inter_est_micro, jaccard_micro)``.

    ``matches`` counts union-sample hashes present in BOTH sketches —
    a uniform sample of A ∪ B scored for membership in A ∩ B, so
    ``jaccard = matches / n_union_sample`` is a direct sample mean and
    ``inter_est = jaccard · union_est``. All row-local array algebra.
    """
    bj = b.withColumnRenamed("hs", "_hs_b")
    if group_cols:
        j = a.join(bj, list(group_cols), "inner")
    else:
        j = a.crossJoin(bj)
    union_hs = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("hs"), F.col("_hs_b")))),
        1,
        k,
    )
    j = j.select(*group_cols, F.col("hs"), F.col("_hs_b"), union_hs.alias("_u"))
    matches = F.size(
        F.filter(
            F.col("_u"),
            lambda v: F.array_contains(F.col("hs"), v)
            & F.array_contains(F.col("_hs_b"), v),
        )
    )
    n_union = F.size(F.col("_u"))
    union_est_micro = _estimate_expr(F.col("_u"), k)
    j = j.select(
        *group_cols,
        F.size("hs").cast("long").alias("n_a"),
        F.size("_hs_b").cast("long").alias("n_b"),
        n_union.cast("long").alias("n_union_sample"),
        matches.cast("long").alias("matches"),
        union_est_micro.alias("union_est_micro"),
    )
    # inter = (matches / n_union) * union_est — operand order mirrored
    # verbatim in the SQL twin; union_est re-derived from its micro int
    # so both engines divide the identical double.
    union_est = F.col("union_est_micro").cast("double") / F.lit(1e6)
    ratio = F.col("matches").cast("double") / F.col("n_union_sample").cast(
        "double"
    )
    return j.select(
        *group_cols,
        "n_a",
        "n_b",
        "n_union_sample",
        "matches",
        "union_est_micro",
        F.floor(ratio * union_est * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("inter_est_micro"),
        F.floor(ratio * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
            "jaccard_micro"
        ),
    )


def kmv_freq_sketch(
    df: DataFrame,
    key_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Frequency-annotated bottom-k sketch of a JOIN KEY column: one
    row ``(hs ARRAY<BIGINT>, cnts ARRAY<BIGINT>)`` — the k smallest
    distinct key hashes with each key's exact row count (the theta
    "sketch with summaries"). Input to :func:`kmv_join_size`.

    Build: one map-side-partial count aggregation on the key (the
    exchange any ``groupBy(key)`` pays — distinct keys, not rows),
    then the k-bounded dense_rank window over the count table. The
    count-first order keeps heavy-hitter multiplicities out of the
    window exchange."""
    h = hash60(F.col(key_col).cast("string"))
    counts = (
        df.select(h.alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("h")
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    pairs = F.array_sort(F.collect_list(F.struct(F.col("h"), F.col("cnt"))))
    return top.groupBy().agg(
        F.transform(pairs, lambda s: s["h"]).alias("hs"),
        F.transform(pairs, lambda s: s["cnt"]).alias("cnts"),
    )


def kmv_join_size(
    a: DataFrame,
    b: DataFrame,
    k: int = KMV_K,
) -> DataFrame:
    """Equi-join OUTPUT-size estimate from two frequency sketches
    (:func:`kmv_freq_sketch` results) WITHOUT executing the join — the
    query-planning question (broadcast? salt? how many shuffle
    partitions?) answered from two k-row summaries:

        Ĵ = (n̂_union / |S_∪|) · Σ_{h ∈ S_∪ present in both} f_a(h)·f_b(h)

    — the union sample is a uniform sample of the distinct-key space,
    each sampled key contributes its EXACT frequency product, and the
    Horvitz–Thompson scale-up is the union cardinality estimate over
    the sample size. Returns one row ``(n_union_sample, matches,
    union_est_micro, sum_products, join_size_est_micro)``. All BIGINT
    until the final mirrored double scaling (micro protocol).
    """
    aj = a.select(F.col("hs").alias("_ha"), F.col("cnts").alias("_ca"))
    bj = b.select(F.col("hs").alias("_hb"), F.col("cnts").alias("_cb"))
    j = aj.crossJoin(bj)
    union_hs = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ha"), F.col("_hb")))),
        1,
        k,
    )
    j = j.select("_ha", "_ca", "_hb", "_cb", union_hs.alias("_u"))
    # per union-sample hash: product of the two exact frequencies when
    # present in both sketches, else 0 — row-local array algebra
    prod = F.aggregate(
        F.col("_u"),
        F.lit(0).cast("long"),
        lambda acc, v: acc
        + F.when(
            F.array_position(F.col("_ha"), v) > 0,
            F.element_at(
                F.col("_ca"), F.array_position(F.col("_ha"), v).cast("int")
            ),
        ).otherwise(F.lit(0).cast("long"))
        * F.when(
            F.array_position(F.col("_hb"), v) > 0,
            F.element_at(
                F.col("_cb"), F.array_position(F.col("_hb"), v).cast("int")
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    matches = F.size(
        F.filter(
            F.col("_u"),
            lambda v: F.array_contains(F.col("_ha"), v)
            & F.array_contains(F.col("_hb"), v),
        )
    )
    n_union = F.size(F.col("_u"))
    union_est_micro = _estimate_expr(F.col("_u"), k)
    j = j.select(
        n_union.cast("long").alias("n_union_sample"),
        matches.cast("long").alias("matches"),
        union_est_micro.alias("union_est_micro"),
        prod.alias("sum_products"),
    )
    scale = (
        F.col("union_est_micro").cast("double")
        / F.lit(1e6)
        / F.col("n_union_sample").cast("double")
    )
    return j.select(
        "n_union_sample",
        "matches",
        "union_est_micro",
        "sum_products",
        F.floor(
            F.col("sum_products").cast("double") * scale * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("join_size_est_micro"),
    )


# --- DuckDB twins (generated from the same constants) ---------------------


def kmv_sketch_cte(
    items_sql: str,
    item_expr: str,
    group_exprs: Sequence[str],
    k: int = KMV_K,
    name: str = "sk",
) -> str:
    """CTE chain (no leading WITH) over the item query ``items_sql``
    ending in ``{name}(group..., hs)`` — the DuckDB twin of
    :func:`kmv_sketch`. All intermediate relations are prefixed with
    ``name`` so several sketches compose in one WITH clause."""
    g_sel = "".join(f"{g}, " for g in group_exprs)
    part = (
        "PARTITION BY " + ", ".join(group_exprs) if group_exprs else ""
    )
    g_by = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    h = hash60_sql(f"({item_expr})::VARCHAR")
    return f"""{name}_items AS ({items_sql}),
        {name}_hashed AS (SELECT {g_sel}{h} AS h FROM {name}_items),
        {name}_d AS (SELECT DISTINCT {g_sel}h FROM {name}_hashed),
        {name}_r AS (SELECT {g_sel}h,
                row_number() OVER ({part} ORDER BY h) AS rn
            FROM {name}_d),
        {name} AS (SELECT {g_sel}list(h ORDER BY h) AS hs
            FROM {name}_r WHERE rn <= {k} {g_by})"""


def _estimate_sql(hs: str, k: int = KMV_K) -> str:
    numerator = repr(float((k - 1) * HASH_SPACE))
    return (
        f"floor((CASE WHEN len({hs}) < {k} THEN len({hs})::DOUBLE "
        f"ELSE {numerator} / ({hs})[{k}]::DOUBLE END) * 1e6 + 0.5)::BIGINT"
    )


def kmv_intersection_sql(
    sketch_ctes: str,
    a_rel: str,
    b_rel: str,
    k: int = KMV_K,
) -> str:
    """Full DuckDB twin of :func:`kmv_intersection` for two ungrouped
    single-row sketch relations ``a_rel`` / ``b_rel`` defined by
    ``sketch_ctes`` (a CTE chain without the leading WITH)."""
    u = (
        f"(list_sort(list_distinct(list_concat(a.hs, b.hs))))"
        f"[1:{k}]"
    )
    est_u = _estimate_sql("u.u_hs", k)
    return f"""
        WITH {sketch_ctes},
        j AS (SELECT a.hs AS a_hs, b.hs AS b_hs, {u} AS u_hs
              FROM {a_rel} a, {b_rel} b),
        u AS (SELECT a_hs, b_hs, u_hs,
                     len(list_filter(u_hs,
                         v -> list_contains(a_hs, v)
                              AND list_contains(b_hs, v))) AS matches
              FROM j)
        SELECT cast(len(a_hs) AS BIGINT) AS n_a,
               cast(len(b_hs) AS BIGINT) AS n_b,
               cast(len(u_hs) AS BIGINT) AS n_union_sample,
               cast(matches AS BIGINT) AS matches,
               {est_u} AS union_est_micro,
               floor((matches::DOUBLE / len(u_hs)::DOUBLE)
                     * (({est_u})::DOUBLE / 1e6)
                     * 1e6 + 0.5)::BIGINT AS inter_est_micro,
               floor((matches::DOUBLE / len(u_hs)::DOUBLE) * 1e6
                     + 0.5)::BIGINT AS jaccard_micro
        FROM u
    """


def kmv_freq_sketch_cte(
    keys_sql: str, k: int = KMV_K, name: str = "fsk"
) -> str:
    """CTE chain (no leading WITH) over a key query ``keys_sql``
    (one column ``key``, one row per underlying row) ending in
    ``{name}(hs, cnts)`` — the DuckDB twin of :func:`kmv_freq_sketch`."""
    h = hash60_sql("(key)::VARCHAR")
    return f"""{name}_counts AS (
            SELECT h, count(*) AS cnt
            FROM (SELECT {h} AS h FROM ({keys_sql})) GROUP BY h),
        {name}_top AS (
            SELECT h, cnt, row_number() OVER (ORDER BY h) AS rn
            FROM {name}_counts),
        {name} AS (
            SELECT list(h ORDER BY h) AS hs,
                   list(cnt ORDER BY h) AS cnts
            FROM {name}_top WHERE rn <= {k})"""


def kmv_join_size_sql(
    a_keys_sql: str, b_keys_sql: str, k: int = KMV_K
) -> str:
    """Full DuckDB twin of :func:`kmv_join_size` over two key queries —
    identical fold, identical scaling operand order, micro protocol."""
    u = f"(list_sort(list_distinct(list_concat(a.hs, b.hs))))[1:{k}]"
    est_u = _estimate_sql("u_hs", k)
    term = (
        "CASE WHEN list_position(ha, v) > 0"
        " THEN ca[list_position(ha, v)] ELSE 0 END"
        " * CASE WHEN list_position(hb, v) > 0"
        " THEN cb[list_position(hb, v)] ELSE 0 END"
    )
    return f"""
        WITH {kmv_freq_sketch_cte(a_keys_sql, k, "ska")},
        {kmv_freq_sketch_cte(b_keys_sql, k, "skb")},
        j AS (SELECT a.hs AS ha, a.cnts AS ca, b.hs AS hb, b.cnts AS cb,
                     {u} AS u_hs
              FROM ska a, skb b),
        scored AS (
            SELECT len(u_hs) AS n_union,
                   len(list_filter(u_hs,
                       v -> list_contains(ha, v)
                            AND list_contains(hb, v))) AS matches,
                   {est_u} AS est_micro,
                   coalesce(list_sum(list_transform(u_hs,
                       v -> {term})), 0) AS sum_products
            FROM j)
        SELECT cast(n_union AS BIGINT) AS n_union_sample,
               cast(matches AS BIGINT) AS matches,
               est_micro AS union_est_micro,
               cast(sum_products AS BIGINT) AS sum_products,
               floor(sum_products::DOUBLE
                     * (est_micro::DOUBLE / 1e6 / n_union::DOUBLE)
                     * 1e6 + 0.5)::BIGINT AS join_size_est_micro
        FROM scored
    """


def kmv_py(items, k: int = KMV_K) -> list[int]:
    """Python twin of :func:`kmv_sketch` (tests)."""
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    return sorted({hash60_py(str(x)) for x in items})[:k]


def kmv_estimate_py(hs: list[int], k: int = KMV_K) -> float:
    """Python twin of the distinct estimator (micro-snapped)."""
    import math

    if len(hs) < k:
        est = float(len(hs))
    else:
        est = float((k - 1) * HASH_SPACE) / float(hs[k - 1])
    return math.floor(est * 1e6 + 0.5) / 1e6
