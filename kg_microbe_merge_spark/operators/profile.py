"""Table profiling: per-column statistics in ONE aggregation pass —
the numbers every physical-planning decision in this repo keys off
(broadcast or not, salt or not, bucket count, dictionary feasibility).

``graph_stats`` reports the KG's semantic shape; this operator reports
any table's PHYSICAL shape: row count, per-column null count, exact
distinct count, min/max. It is the input to the skew prescription
(``operators/skew.py``), to is-this-side-broadcastable checks (NDV ×
avg width), and to choosing the alias-dictionary build strategy in
entity linking (a dictionary column with NDV ≤ millions broadcasts;
more needs the bucketed path).

Plan shape: ONE aggregation over the scan. Spark compiles the
multi-column exact ``countDistinct`` set via Expand — each input row
fans out k+1 times (k = profiled columns), all map-side, partially
aggregated before the single exchange. That k× fan-out is the honest
price of EXACT NDV in one pass; at 100 TB either profile the columns
you need (``columns=``) or use the sketch family
(``operators/sketches.py`` HLL: one pass, no fan-out, ±2 %) — this
module is the exact twin the sketches are judged against.

min/max are computed on the NATIVE type and cast to string afterwards
(``min(cast(c as string))`` would order "10" < "9"); profile columns
whose string rendering is engine-portable (ints, strings, dates —
doubles render differently across engines and belong in the sketch
path anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column; NULLs excluded from distinct/min/max
    (SQL aggregate semantics); min/max rendered as strings of the
    native-type extremes."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_c{i}"),
            F.countDistinct(F.col(c)).alias(f"_d{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _c{i}, _d{i}, _mn{i}, _mx{i}" for i, c in enumerate(cols)
    )
    return one.select(
        F.col("_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, _nonnull, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin: one SELECT per column, UNION ALL — the oracle
    re-derives each statistic independently (k scans are fine at
    oracle scale; the engine's single-pass Expand is the scale
    point)."""
    parts = [
        f"""
        SELECT '{c}' AS column,
               (SELECT count(*) FROM {table}) AS n_rows,
               (SELECT count(*) FROM {table}) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM {table}"""
        for c in columns
    ]
    return "\nUNION ALL".join(parts)
