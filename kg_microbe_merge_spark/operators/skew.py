"""Join/aggregation skew diagnostics: measure a key column's heavy
hitters and derive the salt-bucket prescription.

The repo's skew machinery is reactive where it can be (AQE skew-join
splits, `nodes_merge_skew_aware`'s measured-heavy-id routing) — this
operator is the PLANNING face: before shuffling 100 TB on a key,
measure how concentrated the key actually is and decide broadcast /
salt / plain-shuffle from numbers instead of folklore. It reports the
exact quantities those decisions need:

* per-key row counts for the top heavy hitters (the candidates for
  salting or AQE skew splits),
* total rows / distinct keys / max / p99-ish frequency,
* the concentration ratio ``max_freq · shuffle_partitions / total``
  — how many times more rows the heaviest reducer gets than a uniform
  reducer (1.0 = perfectly balanced), and
* ``suggested_salt_buckets`` per heavy key: ``ceil(freq / target)``
  where ``target = total / shuffle_partitions`` — the bucket count
  that levels that key's reducer back to a uniform share (the integer
  formula `nodes_merge_skew_aware` applies, exposed as data).

Shape: ONE map-side-partial count aggregation over the key (the
exchange any ``groupBy(key)`` pays), then a bounded TakeOrdered of the
top-n heavy keys; the scalar totals come from a second pass over the
COUNT table (key-cardinality-sized, not row-sized). Everything is
exact BIGINT arithmetic — the report is oracle-checkable value for
value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    shuffle_partitions: int,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter report for ``key_col``: one row per top-``top_n``
    key by frequency — ``(key STRING, freq, total_rows, distinct_keys,
    max_freq, concentration_micro, suggested_salt_buckets)``, ordered
    by (freq DESC, key ASC).

    ``suggested_salt_buckets`` is 1 when the key already fits a
    uniform reducer share; a value b > 1 means: salt THIS key into b
    subkeys (two-phase aggregation) to level the shuffle. The
    ``concentration_micro`` column (max_freq · partitions / total,
    micro-snapped) is the whole-column skew verdict — ≈1e6 means
    balanced, 100·1e6 means the top reducer does 100× the uniform
    share.
    """
    if shuffle_partitions <= 0:
        raise ValueError(
            f"shuffle_partitions must be positive, got {shuffle_partitions}"
        )
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).persist()
    stats = counts.groupBy().agg(
        F.sum("freq").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("distinct_keys"),
        F.max("freq").cast("long").alias("max_freq"),
    )
    top = counts.orderBy(F.desc("freq"), F.asc("key")).limit(top_n)
    out = top.crossJoin(F.broadcast(stats))
    counts.unpersist(blocking=False)
    # integer ceil via exact BIGINT div (the sharding.py rule: never
    # floor(double /) — doubles misround past 2^53)
    buckets = F.greatest(
        F.lit(1).cast("long"),
        F.expr(
            f"(freq * {shuffle_partitions} + total_rows - 1)"
            " div total_rows"
        ).cast("long"),
    )
    concentration = F.floor(
        F.col("max_freq").cast("double")
        * F.lit(float(shuffle_partitions))
        / F.col("total_rows").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return out.select(
        "key",
        F.col("freq").cast("long").alias("freq"),
        "total_rows",
        "distinct_keys",
        "max_freq",
        concentration.alias("concentration_micro"),
        buckets.alias("suggested_salt_buckets"),
    )


def skew_report_sql(
    keys_sql: str, shuffle_partitions: int, top_n: int = 20
) -> str:
    """DuckDB twin of :func:`skew_report` over a key query ``keys_sql``
    (one column ``key``, one row per underlying row) — identical
    integer ceil and micro protocol."""
    return f"""
        WITH counts AS (
            SELECT key::VARCHAR AS key, count(*) AS freq
            FROM ({keys_sql}) GROUP BY key),
        stats AS (
            SELECT sum(freq)::BIGINT AS total_rows,
                   count(*)::BIGINT AS distinct_keys,
                   max(freq)::BIGINT AS max_freq
            FROM counts),
        top AS (
            SELECT key, freq FROM counts
            ORDER BY freq DESC, key ASC LIMIT {top_n})
        SELECT top.key,
               cast(top.freq AS BIGINT) AS freq,
               stats.total_rows,
               stats.distinct_keys,
               stats.max_freq,
               floor(stats.max_freq::DOUBLE * {float(shuffle_partitions)!r}
                     / stats.total_rows::DOUBLE * 1e6 + 0.5)::BIGINT
                   AS concentration_micro,
               greatest(1::BIGINT,
                        ((top.freq * {shuffle_partitions}
                          + stats.total_rows - 1)
                         // stats.total_rows)::BIGINT)
                   AS suggested_salt_buckets
        FROM top, stats
    """


def skew_report_py(keys, shuffle_partitions: int, top_n: int = 20):
    """Python twin (tests)."""
    import math
    from collections import Counter

    c = Counter(str(k) for k in keys)
    total = sum(c.values())
    distinct = len(c)
    mx = max(c.values())
    conc = math.floor(mx * float(shuffle_partitions) / total * 1e6 + 0.5)
    rows = []
    for key, freq in sorted(c.items(), key=lambda t: (-t[1], t[0]))[:top_n]:
        buckets = max(1, (freq * shuffle_partitions + total - 1) // total)
        rows.append((key, freq, total, distinct, mx, conc, buckets))
    return rows
