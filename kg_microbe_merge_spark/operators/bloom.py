"""Bloom-filter join pruning: build a fixed-size bitmap over one join
side's keys, prefilter the other side row-locally BEFORE its shuffle.

The 100 TB problem this solves: a semi/inner join where the probe side
is huge but only a small fraction of its rows survive the join. A
plain join shuffles the entire probe side on the join key first and
discards non-matches after; a Bloom prefilter discards them INSIDE the
probe-side scan stage, so the shuffle (the expensive part) carries
only rows that might match. Spark's own runtime row-group/semi-join
filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`) do this
opportunistically; this operator makes the pattern explicit,
deterministic, and cross-engine checkable.

Shape at scale:

* **build**: k probe positions per build-side key are row-local; the
  bitmap is a ``bit_or`` aggregation onto ``n_bits/64`` BIGINT words —
  partially aggregated map-side, so the build shuffle carries at most
  the FIXED bitmap size per partition (2^17 bits = 2 KiB of words by
  default), never the key set. Bitmaps merge by word-wise OR
  (:func:`bloom_merge`) — the build distributes and streams like the
  sketches in ``operators/sketches.py``.
* **probe**: the dense word array (fixed size, data-independent) is
  collected once and inlined as a plan literal — the same
  literal-constant pattern as the IVF centroids and SQ8 bounds — so
  the prefilter is pure row-local whole-stage codegen in the probe
  scan stage: ZERO extra shuffle, zero Python.
* **exactness**: Bloom filters have no false negatives, so
  ``bloom_prune_semi_join`` composes prefilter + exact semi join and
  returns EXACTLY the plain semi join's rows (false positives are
  removed by the exact join); its DuckDB oracle is therefore the
  plain semi join. The decision surface itself
  (:func:`with_might_contain`) is separately oracle-checkable — the
  bitmap construction uses the portable md5/universal-hash family, so
  DuckDB rebuilds the identical bitmap bit-for-bit.

Cross-engine protocol: position ``i`` of key ``x`` is
``universal_slot(hash60(x), i, family) % n_bits``; word = pos >> 6,
bit = pos & 63; membership tests ``(word_value >> bit) & 1 = 1``.
All exact integer arithmetic in Spark SQL, DuckDB, and Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import (
    hash60,
    hash60_sql,
    universal_slot,
    universal_slot_sql,
)

#: default 2^17 bits = 2048 words = 16 KiB; at 10k keys that is ~7.6%
#: load → false-positive rate ~0.04% with k=5
BLOOM_BITS = 1 << 17
BLOOM_K = 5


def _pos(key: Column, i: int, n_bits: int, family: str) -> Column:
    return universal_slot(hash60(key.cast("string")), i, family) % n_bits


def _pos_sql(key_expr: str, i: int, n_bits: int, family: str) -> str:
    h = hash60_sql(f"({key_expr})::VARCHAR")
    return f"(({universal_slot_sql(h, i, family)}) % {n_bits})"


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    family: str = "bloom",
) -> DataFrame:
    """Sparse Bloom bitmap ``(word INT, bits BIGINT)`` over the non-null
    keys of ``df``. At most ``n_bits / 64`` rows regardless of key
    count; merge two bitmaps with :func:`bloom_merge`."""
    if n_bits % 64 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 64")
    key = F.col(key_col)
    probes = F.array(
        *[
            F.struct(
                F.shiftright(_pos(key, i, n_bits, family), 6)
                .cast("int")
                .alias("word"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(({_pos_expr_sql(key_col, i, n_bits, family)}) & 63 AS INT))"
                ).alias("mask"),
            )
            for i in range(k)
        ]
    )
    pr = df.filter(key.isNotNull()).select(F.explode(probes).alias("p"))
    return pr.groupBy(F.col("p.word").alias("word")).agg(
        F.bit_or("p.mask").cast("long").alias("bits")
    )


def _pos_expr_sql(key_col: str, i: int, n_bits: int, family: str) -> str:
    """Spark-SQL text of the position expression (for dynamic-shift
    expr() calls — the python shiftleft wrapper only takes static
    numBits)."""
    h = (
        f"CAST(conv(substring(md5(CAST(`{key_col}` AS STRING)), 1, 15),"
        f" 16, 10) AS BIGINT)"
    )
    return f"(({universal_slot_sql(h, i, family)}) % {n_bits})"


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two bitmaps (word-wise OR): bloom(A ∪ B)."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or("bits").cast("long").alias("bits"))
    )


def bloom_literal(bitmap: DataFrame, n_bits: int = BLOOM_BITS) -> list[int]:
    """Collect the sparse bitmap into a dense word list (fixed
    ``n_bits/64`` entries — a bounded driver action, like the SQ8
    min/max train step)."""
    words = [0] * (n_bits // 64)
    for r in bitmap.collect():
        words[r["word"]] = r["bits"]
    return words


def with_might_contain(
    df: DataFrame,
    key_col: str,
    words: list[int],
    k: int = BLOOM_K,
    family: str = "bloom",
    out_col: str = "might_contain",
) -> DataFrame:
    """Row-local membership test against an inlined bitmap literal:
    adds ``out_col BOOLEAN``. No shuffle, no Python — the k probes are
    integer expressions inside the scan stage. NULL keys test false."""
    n_bits = len(words) * 64
    terms = []
    for i in range(k):
        pos = _pos_expr_sql(key_col, i, n_bits, family)
        terms.append(
            f"((element_at(_bm, CAST(shiftright({pos}, 6) AS INT) + 1)"
            f" >> CAST(({pos} & 63) AS INT)) & 1) = 1"
        )
    test = F.expr("(" + ") AND (".join(terms) + ")")
    return (
        df.withColumn("_bm", F.lit(words))
        .withColumn(
            out_col,
            F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(test),
        )
        .drop("_bm")
    )


def bloom_prune_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    family: str = "bloom",
) -> DataFrame:
    """Semi join ``big ⋉ small`` with a Bloom prefilter on the big side:
    identical rows to ``big.join(small, on, "left_semi")`` (no false
    negatives; false positives die in the exact join), but the big
    side's shuffle carries only rows passing the row-local bitmap
    test."""
    words = bloom_literal(
        bloom_bitmap(small, small_key, n_bits, k, family), n_bits
    )
    pruned = with_might_contain(
        big, big_key, words, k, family, out_col="_mc"
    ).filter(F.col("_mc")).drop("_mc")
    return pruned.join(
        small.select(F.col(small_key).alias("__bk")).distinct(),
        pruned[big_key] == F.col("__bk"),
        "left_semi",
    )


def bloom_decisions_sql(
    build_cte: str,
    build_key: str,
    probe_cte: str,
    probe_cols: str,
    probe_key: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    family: str = "bloom",
) -> str:
    """DuckDB twin of build + :func:`with_might_contain`:
    ``build_cte`` / ``probe_cte`` must define relations ``build`` and
    ``probe``; returns ``SELECT {probe_cols}, might_contain``.
    Generated from the same constants as the Spark path."""
    pos_union = " UNION ALL ".join(
        f"SELECT ({_pos_sql(build_key, i, n_bits, family)}) AS pos FROM build"
        f" WHERE {build_key} IS NOT NULL"
        for i in range(k)
    )
    tests = " AND ".join(
        f"coalesce(((SELECT bits FROM bm WHERE word ="
        f" (({_pos_sql(probe_key, i, n_bits, family)}) >> 6))"
        f" >> (({_pos_sql(probe_key, i, n_bits, family)}) & 63)) & 1 = 1,"
        f" FALSE)"
        for i in range(k)
    )
    return f"""
        WITH {build_cte},
        pos AS ({pos_union}),
        bm AS MATERIALIZED (
            SELECT (pos >> 6)::INT AS word,
                   -- DuckDB checks overflow on 1<<63; Spark wraps to
                   -- min-long. Emit the min-long literal for bit 63.
                   bit_or(CASE WHEN (pos & 63) = 63
                               THEN (-9223372036854775807 - 1)
                               ELSE 1::BIGINT << (pos & 63)::INT
                          END)::BIGINT AS bits
            FROM pos GROUP BY 1),
        {probe_cte}
        SELECT {probe_cols},
               CASE WHEN {probe_key} IS NULL THEN FALSE
                    ELSE ({tests}) END AS might_contain
        FROM probe
    """


def bloom_py(keys, n_bits: int = BLOOM_BITS, k: int = BLOOM_K, family: str = "bloom"):
    """Python twin: (dense word list, membership fn)."""
    from kg_microbe_merge_spark.functions.hashing import (
        MERSENNE31,
        hash60_py,
        universal_params,
    )

    params = [universal_params(i, family) for i in range(k)]

    def positions(key) -> list[int]:
        h = hash60_py(str(key)) & 0x7FFFFFFF
        return [((h * a + b) % MERSENNE31) % n_bits for a, b in params]

    words = [0] * (n_bits // 64)
    for key in keys:
        for p in positions(key):
            words[p >> 6] |= 1 << (p & 63)
    # Spark/DuckDB BIGINT is signed two's complement: wrap bit-63 words
    # negative so the dense lists compare equal across engines
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    def contains(key) -> bool:
        # arithmetic >> on negative python ints preserves low bits
        return all((words[p >> 6] >> (p & 63)) & 1 for p in positions(key))

    return words, contains
