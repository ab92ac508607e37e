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


def schema_summary(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    category_col: str = "category",
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """Quotient-graph schema summary: collapse the instance KG to its
    TYPE graph — one row per (subject_category, predicate,
    object_category) with the number of instance edges behind it,
    plus each side's distinct-entity count.

    This is the KG-schema-discovery operator (SNAP-style graph
    summarization restricted to the category dimension): "what
    connects to what, by which predicates, and how thickly" — the
    empirical input to the SHACL-lite expectations table
    (operators/validate.py) and the first thing a consumer asks of an
    unfamiliar KG.

    Shape: two id-equi joins against the node table (the same key
    every merge/coverage/validation op shuffles on — a bucketed node
    store co-locates all of them), then ONE partially-aggregable
    grouped count with two distinct-counts. Missing endpoints land in
    category 'Unknown' (absent is a schema fact, not a silent drop) —
    matching the NULL convention of :func:`graph_stats`."""
    n = nodes.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(category_col), F.lit("Unknown")).alias("_cat"),
    )
    e = edges.select(
        F.col(subject_col).alias("_s"),
        F.col(predicate_col).alias("predicate"),
        F.col(object_col).alias("_o"),
    )
    sc = n.select(
        F.col("_id").alias("_s"), F.col("_cat").alias("subject_category")
    )
    oc = n.select(
        F.col("_id").alias("_o"), F.col("_cat").alias("object_category")
    )
    return (
        e.join(sc, "_s", "left")
        .join(oc, "_o", "left")
        .select(
            F.coalesce("subject_category", F.lit("Unknown")).alias(
                "subject_category"
            ),
            "predicate",
            F.coalesce("object_category", F.lit("Unknown")).alias(
                "object_category"
            ),
            "_s",
            "_o",
        )
        .groupBy("subject_category", "predicate", "object_category")
        .agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("_s").alias("n_subjects"),
            F.countDistinct("_o").alias("n_objects"),
        )
    )


def schema_summary_sql(nodes_cte: str, edges_cte: str) -> str:
    """DuckDB twin of :func:`schema_summary` over CTEs providing
    (id, category) and (subject, predicate, object)."""
    return f"""
        SELECT coalesce(sn.category, 'Unknown') AS subject_category,
               e.predicate,
               coalesce(onn.category, 'Unknown') AS object_category,
               count(*) AS n_edges,
               count(DISTINCT e.subject) AS n_subjects,
               count(DISTINCT e.object) AS n_objects
        FROM {edges_cte} e
        LEFT JOIN {nodes_cte} sn ON e.subject = sn.id
        LEFT JOIN {nodes_cte} onn ON e.object = onn.id
        GROUP BY 1, 2, 3
    """
