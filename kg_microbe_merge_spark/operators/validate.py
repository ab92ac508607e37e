"""SHACL-lite KG validation: domain/range conformance, cardinality
bounds, CURIE well-formedness — the quality gate between canonical-
ization and publishing.

The reference validates one structural property (edge endpoints exist
as nodes — `/root/reference/kg_microbe_merge/utils/edge_vs_node_check.py:45-66`,
ported as ``operators/merge.coverage_check``). A production KG release
also checks SEMANTIC conformance — Biolink association slots carry
domain/range expectations (gene_associated_with_condition links a Gene
to a Disease, not the reverse), identifiers must be CURIEs, and some
predicates are functional (at most one object per subject). This
module implements those three checks Spark-first:

* :func:`domain_range_violations` — per constrained edge, does each
  endpoint's (pipe-joined, multi-valued) ``category`` include the
  expected class? Expectations join by predicate (a broadcast-class
  table: one row per constrained predicate); endpoint categories come
  from TWO id-equi joins against the node table — the same key every
  merge/coverage op shuffles on, so a bucketed node store co-locates
  all of them. The pipe-membership test is row-local
  (``array_contains(split(category, '[|]'), expected)``), matching
  the KGX convention the merge writes. A missing endpoint node (NULL
  category) is reported as ``actual_category = NULL`` rather than
  silently passing — absent is not conformant.
* :func:`cardinality_violations` — (subject, predicate) groups whose
  object count exceeds the predicate's bound: one map-side-combinable
  count, broadcast bounds join, no row lists.
* :func:`curie_violations` — ids failing the CURIE grammar
  ``prefix:local`` (row-local regex, zero shuffle).

All outputs are violation ROWS (entity + what was expected + what was
found), not booleans — at 100 TB the report is itself a dataset the
release pipeline aggregates, samples, and routes back to source
owners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: prefix ':' local — prefix starts alphabetic, local non-empty, no
#: whitespace/pipe (the KGX multi-value separator must never appear
#: inside an id). RE2-safe: no lookaround.
CURIE_RE = r"^[A-Za-z_][A-Za-z0-9_.-]*:[^\s|]+$"


def _has_category(category_col, expected_col) -> F.Column:
    return F.array_contains(
        F.split(category_col, r"\|"), expected_col
    )


def domain_range_violations(
    edges: DataFrame,
    nodes: DataFrame,
    expectations: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    id_col: str = "id",
    category_col: str = "category",
) -> DataFrame:
    """Edges whose subject/object category set lacks the expected
    class for their predicate. ``expectations``: (predicate,
    subject_category, object_category) — one row per constrained
    predicate; unconstrained predicates are not checked. Output one
    row per violating END: (subject, predicate, object, end,
    expected_category, actual_category) with ``end`` in
    ('subject', 'object') and NULL actual for a missing node."""
    e = edges.select(
        F.col(subject_col).alias("subject"),
        F.col(predicate_col).alias("predicate"),
        F.col(object_col).alias("object"),
    ).join(
        F.broadcast(
            expectations.select(
                F.col("predicate"),
                F.col("subject_category"),
                F.col("object_category"),
            )
        ),
        "predicate",
    )
    cats = nodes.select(
        F.col(id_col).alias("_nid"), F.col(category_col).alias("_cat")
    )

    def _end(end_col: str, expected: str, tag: str) -> DataFrame:
        joined = e.join(
            cats, e[end_col] == cats["_nid"], "left"
        )
        bad = joined.filter(
            F.col("_cat").isNull()
            | ~_has_category(F.col("_cat"), F.col(expected))
        )
        return bad.select(
            "subject",
            "predicate",
            "object",
            F.lit(tag).alias("end"),
            F.col(expected).alias("expected_category"),
            F.col("_cat").alias("actual_category"),
        )

    return _end("subject", "subject_category", "subject").unionByName(
        _end("object", "object_category", "object")
    )


def cardinality_violations(
    edges: DataFrame,
    max_objects: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """(subject, predicate) pairs with more DISTINCT objects than the
    predicate's bound. ``max_objects``: (predicate, max_out) — only
    listed predicates are checked. Output: (subject, predicate,
    n_objects, max_out)."""
    counts = (
        edges.select(
            F.col(subject_col).alias("subject"),
            F.col(predicate_col).alias("predicate"),
            F.col(object_col).alias("object"),
        )
        .distinct()
        .groupBy("subject", "predicate")
        .agg(F.count("*").alias("n_objects"))
    )
    return counts.join(
        F.broadcast(max_objects.select("predicate", "max_out")),
        "predicate",
    ).filter(F.col("n_objects") > F.col("max_out")).select(
        "subject", "predicate", "n_objects", "max_out"
    )


def curie_violations(
    nodes: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Node ids failing the CURIE grammar (row-local regex, zero
    shuffle). Output: (id,)."""
    i = F.col(id_col)
    return nodes.select(i.alias("id")).filter(
        i.isNull() | ~i.rlike(CURIE_RE)
    )


def domain_range_sql(
    edges_cte: str, nodes_cte: str, expect_cte: str
) -> str:
    """DuckDB twin of :func:`domain_range_violations` over CTEs
    providing (subject, predicate, object), (id, category), and
    (predicate, subject_category, object_category)."""

    def _end(end_col: str, expected: str, tag: str) -> str:
        return f"""
            SELECT e.subject, e.predicate, e.object,
                   '{tag}' AS "end",
                   x.{expected} AS expected_category,
                   n.category AS actual_category
            FROM {edges_cte} e
            JOIN {expect_cte} x USING (predicate)
            LEFT JOIN {nodes_cte} n ON e.{end_col} = n.id
            WHERE n.category IS NULL
               OR NOT list_contains(
                      string_split(n.category, '|'), x.{expected})
        """

    return (
        _end("subject", "subject_category", "subject")
        + " UNION ALL "
        + _end("object", "object_category", "object")
    )
