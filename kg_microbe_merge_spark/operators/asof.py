"""As-of (point-in-time) join — backward inclusive.

Spark has no native ASOF join; the naive formulations are a range
cross-join (quadratic blowup per key) or per-key ``applyInPandas``
(Python in the hot path). This implementation is the union-window
pattern: tag both sides, union, ONE shuffle+sort per key on
(ts, side-tag), and fill each left row with ``last(value,
ignorenulls=True)`` over the preceding rows — right rows at the same
timestamp sort before left rows, giving inclusive ``left.ts >=
right.ts`` semantics (matching DuckDB/kdb ASOF JOIN, which is the
oracle in the driver gate).

Cost: O((|L|+|R|) log) in one exchange — the same shape as a window
aggregation; no row multiplication, skew handled by AQE like any other
window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "",
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the most recent
    right row with the same ``on`` keys and ``right_ts <= left_ts``
    (NULLs when no such row). Output: all left columns + value columns
    (optionally suffixed)."""
    out_vals = [c + suffix for c in value_cols]
    # A NULL right timestamp can never satisfy left.ts >= right.ts (ASOF
    # semantics; DuckDB ASOF JOIN agrees) — drop those rows BEFORE the
    # union, else they sort first (nulls-first asc) and their values
    # would silently propagate to every left row in the key.
    right = right.filter(F.col(right_ts).isNotNull())
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_asof_tag"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_t").asc(), F.col("_asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("_asof_tag") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_f_{c}").alias(oc) for c, oc in zip(value_cols, out_vals)],
        )
    )
