"""Bucketed materialization for co-located joins.

At 100 TB the dominant recurring cost of the KG workload is re-shuffling
the node and edge tables on ``id``/``subject`` for every merge, link and
coverage pass. Bucketing amortizes that: write once hash-bucketed (and
sorted) on the join key, and every subsequent equi-join/aggregation on
that key reads co-located buckets — SortMergeJoin with NO Exchange on
either side (verified in tests at the plan level).

Parquet/Hive-style bucketing via ``bucketBy``/``saveAsTable`` (the
catalog records bucket metadata; an Iceberg deployment would express the
same as a ``bucket(N, id)`` partition transform). Readers must keep
``spark.sql.sources.bucketing.enabled=true`` (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted)
    managed table keyed for downstream joins on ``bucket_cols``."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
