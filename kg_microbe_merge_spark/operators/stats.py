"""Merged-graph summary statistics — the Spark analogue of the
reference's legacy-KGX ``graph-stats`` operation (merge.py:50-60, which
delegates to kgx ``graph_stats``: node/edge counts per category/
predicate in every merge's YAML report).

One pass per input table, each a single partially-aggregable hash
aggregation (map-side combine → tiny shuffle), unioned into a long-form
(section, key, n) report — cheap enough to run after every merge at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_stats(
    nodes: DataFrame,
    edges: DataFrame,
    category_col: str = "category",
    predicate_col: str = "predicate",
) -> DataFrame:
    """(section, key, n) summary of a merged KG:

    - ``nodes_by_category``: node count per (merged, pipe-joined)
      category string — NULL categories report as 'Unknown';
    - ``edges_by_predicate``: edge count per predicate;
    - ``totals``: total_nodes / total_edges.

    Output is sorted (section, key) — it is a small report, the sort is
    driver-friendly display order, not a data-path exchange.
    """
    by_cat = (
        nodes.groupBy(
            F.coalesce(F.col(category_col), F.lit("Unknown")).alias("key")
        )
        .agg(F.count("*").alias("n"))
        .select(F.lit("nodes_by_category").alias("section"), "key", "n")
    )
    by_pred = (
        edges.groupBy(F.col(predicate_col).alias("key"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("edges_by_predicate").alias("section"), "key", "n")
    )
    totals = (
        nodes.agg(F.count("*").alias("n"))
        .select(F.lit("totals").alias("section"), F.lit("total_nodes").alias("key"), "n")
        .unionByName(
            edges.agg(F.count("*").alias("n")).select(
                F.lit("totals").alias("section"),
                F.lit("total_edges").alias("key"),
                "n",
            )
        )
    )
    return by_cat.unionByName(by_pred).unionByName(totals).orderBy("section", "key")
