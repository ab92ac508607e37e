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


def mine_expectations(
    summary: DataFrame,
    min_support: int = 1,
    min_confidence_micro: int = 500_000,
) -> DataFrame:
    """Induce domain/range expectations FROM the data — the discovery
    half of the validation loop (``schema_summary`` describes what the
    KG does; this distills it into the ``(predicate,
    subject_category, object_category)`` expectations table that
    :func:`domain_range_violations` then enforces, so constraints can
    be mined on a trusted snapshot and applied to the next delta).

    Input is a :func:`..stats.schema_summary` relation. Per predicate
    each side's MAJORITY category wins (deterministic (count DESC,
    category ASC) tie-break); a predicate is emitted only when

    * its total edge count >= ``min_support``,
    * BOTH majority shares >= ``min_confidence_micro`` (exact-integer
      micro fraction, (10^6·cnt + tot div 2) div tot), and
    * neither majority is the 'Unknown' bucket (an expectation
      "subject may be anything unresolved" validates nothing).

    Output: (predicate, subject_category, object_category, n_edges,
    subject_confidence_micro, object_confidence_micro) — all counts
    BIGINT, no floats.

    Shape: two map-side-combinable grouped sums over the (already
    type-graph-sized) summary + per-predicate ``min(struct)`` argmax
    + one tiny predicate-keyed totals join — nothing rescans the
    instance KG.
    """
    tot = summary.groupBy("predicate").agg(
        F.sum("n_edges").alias("tot")
    )

    def _side(cat_col: str) -> DataFrame:
        return (
            summary.groupBy("predicate", cat_col)
            .agg(F.sum("n_edges").alias("cnt"))
            .groupBy("predicate")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"),
                        F.col(cat_col).alias("cat"),
                    )
                ).alias("b")
            )
            .select(
                "predicate",
                F.col("b.cat").alias(cat_col),
                (-F.col("b.neg")).alias(f"_cnt_{cat_col}"),
            )
        )

    s = _side("subject_category")
    o = _side("object_category")
    out = (
        s.join(o, "predicate")
        .join(tot, "predicate")
        .select(
            "predicate",
            "subject_category",
            "object_category",
            F.col("tot").cast("bigint").alias("n_edges"),
            F.expr(
                "(1000000 * _cnt_subject_category + tot div 2) div tot"
            ).cast("bigint").alias("subject_confidence_micro"),
            F.expr(
                "(1000000 * _cnt_object_category + tot div 2) div tot"
            ).cast("bigint").alias("object_confidence_micro"),
        )
    )
    return out.filter(
        (F.col("n_edges") >= min_support)
        & (F.col("subject_confidence_micro") >= min_confidence_micro)
        & (F.col("object_confidence_micro") >= min_confidence_micro)
        & (F.col("subject_category") != "Unknown")
        & (F.col("object_category") != "Unknown")
    )


def mine_expectations_sql(
    summary_sql: str,
    min_support: int = 1,
    min_confidence_micro: int = 500_000,
) -> str:
    """DuckDB twin of :func:`mine_expectations` over a SQL relation
    with the schema_summary columns — identical tie-break
    (count DESC, category ASC ≡ min(struct(-cnt, cat))) and integer
    confidence arithmetic."""
    return f"""
        WITH su AS MATERIALIZED ({summary_sql}),
        tot AS (SELECT predicate, sum(n_edges) AS tot FROM su GROUP BY 1),
        sc AS (
            SELECT predicate, subject_category, sum(n_edges) AS cnt
            FROM su GROUP BY 1, 2),
        bs AS (
            SELECT predicate, subject_category, cnt FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY predicate
                    ORDER BY cnt DESC, subject_category ASC) AS rn
                FROM sc) WHERE rn = 1),
        oc AS (
            SELECT predicate, object_category, sum(n_edges) AS cnt
            FROM su GROUP BY 1, 2),
        bo AS (
            SELECT predicate, object_category, cnt FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY predicate
                    ORDER BY cnt DESC, object_category ASC) AS rn
                FROM oc) WHERE rn = 1)
        SELECT bs.predicate, bs.subject_category, bo.object_category,
               CAST(tot.tot AS BIGINT) AS n_edges,
               CAST((1000000 * bs.cnt + tot.tot // 2) // tot.tot
                    AS BIGINT) AS subject_confidence_micro,
               CAST((1000000 * bo.cnt + tot.tot // 2) // tot.tot
                    AS BIGINT) AS object_confidence_micro
        FROM bs JOIN bo ON bs.predicate = bo.predicate
        JOIN tot ON tot.predicate = bs.predicate
        WHERE tot.tot >= {min_support}
          AND (1000000 * bs.cnt + tot.tot // 2) // tot.tot
              >= {min_confidence_micro}
          AND (1000000 * bo.cnt + tot.tot // 2) // tot.tot
              >= {min_confidence_micro}
          AND bs.subject_category <> 'Unknown'
          AND bo.object_category <> 'Unknown'
    """
