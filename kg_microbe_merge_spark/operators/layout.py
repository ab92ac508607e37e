"""Z-order (Morton) file layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file min-max statistics prune scans, but they only
help if the writer CLUSTERED the data so each file covers a narrow
range of the filter columns. Sorting by a single column clusters that
column perfectly and leaves every other filter column spread across
all files; interleaving the bits of several columns (the Z-order /
Morton curve — the same layout `OPTIMIZE ZORDER BY` applies in
Delta/Iceberg compaction) gives every interleaved dimension
locality, so a predicate on ANY of them prunes most files.

Everything here is deterministic integer arithmetic, zero shuffle
beyond the final range partitioning, zero Python:

* :func:`z_value` — bit-interleave up to 4 already-bucketed integer
  columns into one BIGINT sort key, built as a static
  shift/mask/OR expression tree (whole-stage codegen; the DuckDB twin
  in ``__spark_entry__`` is the same expression generated for SQL).
* :func:`bucketize` — rank-free equi-width bucketing of a numeric /
  timestamp column into ``2^bits`` cells given (min, max) bounds —
  bounds come from a prior tiny ``agg(min, max)`` or are known from
  partition metadata; no global sort is needed to bucket.
* :func:`write_zordered` — repartitionByRange + sortWithinPartitions
  on the z-value, then write: one range shuffle total, after which
  every output file covers a compact Z-curve segment (tight min/max
  on every interleaved dimension — verified against parquet footer
  statistics in ``tests/test_layout.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Equi-width bucket id in [0, 2^bits): ``floor((x - lo) / width)``
    clamped to the range — deterministic, no data-dependent state."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    n = 1 << bits
    width = (hi - lo) / n
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)).cast(
        "long"
    )
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(n - 1).cast("long"), raw))


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave up to 4 bucket-id columns (each already in
    [0, 2^bits)) into one BIGINT: bit ``b`` of column ``i`` lands at
    output bit ``b * n_cols + i``. Built as a static OR-of-shifts
    expression — ``n_cols * bits`` terms of pure integer codegen."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("z_value interleaves 1-4 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    terms = []
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def z_value_sql(exprs: list[str], bits: int = 16) -> str:
    """The identical interleave as a SQL expression string (DuckDB /
    ANSI) — the oracle twin generator."""
    n = len(exprs)
    terms = []
    for i, e in enumerate(exprs):
        for b in range(bits):
            # fully parenthesized: SQL bitwise ops (<<, |, &) share a
            # precedence tier in DuckDB and associate left, so an
            # unwrapped `a << s | b << t` cascades the shifts
            terms.append(f"(((({e}) >> {b}) & 1) << {b * n + i})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    zcol: Column,
    path: str,
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` along ``zcol`` into ``num_files`` range
    partitions (one range shuffle — Spark samples the z distribution
    for balanced boundaries), sort within each, and write. Each output
    file then covers one compact Z-curve segment, so parquet min/max
    footer stats prune on EVERY interleaved dimension."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
