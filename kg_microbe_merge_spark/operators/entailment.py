"""RDFS-lite entailment materialization — stratified forward-chaining
of the schema rules (rdfs2/3/5/7/9/11) over a broadcast TBox.

The reference merges KGX triples; Biolink IS an RDFS-style schema
(``biolink:treats`` has a domain/range, predicates form a
``subPropertyOf`` hierarchy, categories a ``subClassOf`` hierarchy —
the flat prefix→category map in `/root/reference/kg_microbe_merge/
utils/edge_vs_node_check.py:7-20` is its one-level shadow). Consumers
of a merged KG want the ENTAILED graph: query ``related_to`` and see
``treats`` edges, query ``Disease`` instances and see asserted
``Syndrome`` rows. This module materializes exactly that closure.

Why stratified (three ABox passes), not a fixpoint loop: RDFS-lite
rule dependencies form a DAG once the TBox is closed first —

    TBox closures  : subPropertyOf+ (rdfs5), subClassOf+ (rdfs11)
    pass 1 (rdfs7) : (s p o), p ⊑ q           → (s q o)
    pass 2 (rdfs2/3): (s p o), dom/range(p)=C → (s/o type C)
    pass 3 (rdfs9) : (s type C), C ⊑ D        → (s type D)

pass 2 must see pass 1's output (a superproperty's domain applies to
subproperty instances) and pass 3 must see pass 2's (derived types
inherit up), but nothing feeds back: rdfs7/2/3 never apply to the
``type`` triples pass 3 emits (lite profile: no subproperties of
``rdf:type`` and no domain/range ON ``rdf:type`` — enforced, see
:class:`UnsupportedTBoxError`). One pass each, done — no convergence
loop over the ABox, ever.

100 TB shape: the TBox (ontology) is thousands of rows; the ABox is
the 100 TB. Every rule join here is ABox ⋈ broadcast(TBox-closure) —
the ABox is scanned ONCE per pass with zero shuffle (plan-asserted in
tests/test_entailment.py); the only wide operation in the whole
operator is the final ``distinct`` on the output triples, and that is
irreducible (entailment IS a set). TBox closures use
:func:`..closure.transitive_closure` (path doubling, log rounds) —
negligible at ontology scale and already oracle-proven.

Output-size honesty: entailment multiplies rows by the hierarchy
depth along each triple's predicate/class chain (Biolink: ≤ ~10).
Materialized size ≈ |ABox| × mean chain depth — budget the sink for
it, or filter the broadcast closures to the predicates/classes a
consumer asks for (the operator takes the closures as plain DFs
precisely so callers can prune them first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import transitive_closure

#: RDFS-lite vocabulary (CURIE forms; callers override per KG dialect).
TYPE_PRED = "rdf:type"
SUBCLASS_PRED = "rdfs:subClassOf"
SUBPROP_PRED = "rdfs:subPropertyOf"
DOMAIN_PRED = "rdfs:domain"
RANGE_PRED = "rdfs:range"

_SCHEMA_PREDS = (SUBCLASS_PRED, SUBPROP_PRED, DOMAIN_PRED, RANGE_PRED)


class UnsupportedTBoxError(ValueError):
    """Raised when the TBox leaves the lite profile: a subproperty
    relation involving ``rdf:type`` or a domain/range declared ON
    ``rdf:type`` would re-awaken passes 1-2 after pass 3 and demand a
    true fixpoint; materialize with a general Datalog engine instead."""


def split_tbox(
    triples: DataFrame,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> tuple[DataFrame, DataFrame]:
    """(tbox, abox): schema rows (subClassOf/subPropertyOf/domain/
    range) vs everything else. One scan, a row-local predicate filter
    each way — at 100 TB the TBox filter output is tiny and the ABox
    side IS the input scan with a pushed predicate."""
    t = triples.select(
        F.col(subject_col).alias("subject"),
        F.col(predicate_col).alias("predicate"),
        F.col(object_col).alias("object"),
    )
    is_schema = F.col("predicate").isin(*_SCHEMA_PREDS)
    return t.filter(is_schema), t.filter(~is_schema)


def rdfs_entailment(
    abox: DataFrame,
    tbox: DataFrame,
    type_pred: str = TYPE_PRED,
    include_asserted: bool = True,
    max_iterations: int = 30,
) -> DataFrame:
    """Materialize the RDFS-lite entailed graph of ``abox`` under
    ``tbox``. Both are (subject, predicate, object); the TBox holds
    the schema rows (see :func:`split_tbox`). Returns distinct
    (subject, predicate, object) — asserted triples included unless
    ``include_asserted=False`` (then only the strictly derived rows,
    the release-pipeline "what did reasoning add" delta)."""
    tb = tbox.select("subject", "predicate", "object")

    def _pairs(pred: str) -> DataFrame:
        return tb.filter(F.col("predicate") == pred).select(
            F.col("subject").alias("src"), F.col("object").alias("dst")
        )

    # Lite-profile guard: rdf:type in a property hierarchy or carrying
    # domain/range breaks the stratification (see module docstring).
    bad = tb.filter(
        (
            (F.col("predicate") == SUBPROP_PRED)
            & (
                (F.col("subject") == type_pred)
                | (F.col("object") == type_pred)
            )
        )
        | (
            F.col("predicate").isin(DOMAIN_PRED, RANGE_PRED)
            & (F.col("subject") == type_pred)
        )
    )
    if bad.limit(1).count() > 0:
        raise UnsupportedTBoxError(
            "TBox declares rdf:type in a subPropertyOf relation or "
            "gives it a domain/range — outside the RDFS-lite "
            "stratification; use a fixpoint Datalog materializer"
        )

    # TBox closures (rdfs5 / rdfs11) — path doubling over tiny inputs.
    subprop_c = transitive_closure(
        _pairs(SUBPROP_PRED), max_iterations=max_iterations
    )
    subclass_c = transitive_closure(
        _pairs(SUBCLASS_PRED), max_iterations=max_iterations
    )
    domains = _pairs(DOMAIN_PRED).withColumnRenamed("dst", "cls")
    ranges = _pairs(RANGE_PRED).withColumnRenamed("dst", "cls")

    a = abox.select("subject", "predicate", "object").filter(
        F.col("subject").isNotNull()
        & F.col("predicate").isNotNull()
        & F.col("object").isNotNull()
    )

    # pass 1 — rdfs7: lift each triple to every strict superproperty.
    lifted = (
        a.join(
            F.broadcast(subprop_c),
            a["predicate"] == subprop_c["src"],
        )
        .select("subject", F.col("dst").alias("predicate"), "object")
    )
    expanded = a.unionByName(lifted)

    # pass 2 — rdfs2/rdfs3 over the expanded set (superproperty
    # domains/ranges reach subproperty instances through pass 1).
    dom_types = (
        expanded.join(
            F.broadcast(domains),
            expanded["predicate"] == domains["src"],
        )
        .select(
            "subject",
            F.lit(type_pred).alias("predicate"),
            F.col("cls").alias("object"),
        )
    )
    rng_types = (
        expanded.join(
            F.broadcast(ranges),
            expanded["predicate"] == ranges["src"],
        )
        .select(
            F.col("object").alias("subject"),
            F.lit(type_pred).alias("predicate"),
            F.col("cls").alias("object"),
        )
    )
    types = (
        expanded.filter(F.col("predicate") == type_pred)
        .unionByName(dom_types)
        .unionByName(rng_types)
    )

    # pass 3 — rdfs9: inherit every type up the closed class hierarchy.
    super_types = (
        types.join(
            F.broadcast(subclass_c),
            types["object"] == subclass_c["src"],
        )
        .select(
            "subject",
            F.lit(type_pred).alias("predicate"),
            F.col("dst").alias("object"),
        )
    )

    # TBox entailments as triples (rdfs5/11 materialized).
    tbox_closed = subprop_c.select(
        F.col("src").alias("subject"),
        F.lit(SUBPROP_PRED).alias("predicate"),
        F.col("dst").alias("object"),
    ).unionByName(
        subclass_c.select(
            F.col("src").alias("subject"),
            F.lit(SUBCLASS_PRED).alias("predicate"),
            F.col("dst").alias("object"),
        )
    )

    derived = (
        lifted.unionByName(dom_types)
        .unionByName(rng_types)
        .unionByName(super_types)
        .unionByName(tbox_closed)
    )
    if include_asserted:
        out = expanded.unionByName(types).unionByName(derived).unionByName(tb)
    else:
        asserted = a.unionByName(tb)
        out = derived.join(
            asserted,
            ["subject", "predicate", "object"],
            "left_anti",
        )
    return out.distinct()


def entailment_sql(
    abox_cte: str,
    tbox_cte: str,
    type_pred: str = TYPE_PRED,
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin: the same stratified rules as recursive CTEs + rule
    joins over CTEs providing (subject, predicate, object). Returns a
    complete ``WITH RECURSIVE`` query selecting the entailed distinct
    triples (asserted included); ``prelude_ctes`` (e.g.
    ``"tbox AS (...), abox AS (...),"``) lets callers define the two
    input CTEs inside the same WITH block."""
    return f"""
WITH RECURSIVE
{prelude_ctes}
sp(src, dst) AS (
    SELECT subject, object FROM {tbox_cte} WHERE predicate = '{SUBPROP_PRED}'
    UNION
    SELECT sp.src, t.object FROM sp
    JOIN {tbox_cte} t ON sp.dst = t.subject AND t.predicate = '{SUBPROP_PRED}'),
sc(src, dst) AS (
    SELECT subject, object FROM {tbox_cte} WHERE predicate = '{SUBCLASS_PRED}'
    UNION
    SELECT sc.src, t.object FROM sc
    JOIN {tbox_cte} t ON sc.dst = t.subject AND t.predicate = '{SUBCLASS_PRED}'),
a AS (
    SELECT subject, predicate, object FROM {abox_cte}
    WHERE subject IS NOT NULL AND predicate IS NOT NULL AND object IS NOT NULL),
expanded AS (
    SELECT * FROM a
    UNION ALL
    SELECT a.subject, sp.dst AS predicate, a.object FROM a
    JOIN sp ON a.predicate = sp.src),
dom_types AS (
    SELECT e.subject, '{type_pred}' AS predicate, t.object
    FROM expanded e JOIN {tbox_cte} t
    ON e.predicate = t.subject AND t.predicate = '{DOMAIN_PRED}'),
rng_types AS (
    SELECT e.object AS subject, '{type_pred}' AS predicate, t.object
    FROM expanded e JOIN {tbox_cte} t
    ON e.predicate = t.subject AND t.predicate = '{RANGE_PRED}'),
types AS (
    SELECT * FROM expanded WHERE predicate = '{type_pred}'
    UNION ALL SELECT * FROM dom_types
    UNION ALL SELECT * FROM rng_types),
super_types AS (
    SELECT ty.subject, '{type_pred}' AS predicate, sc.dst AS object
    FROM types ty JOIN sc ON ty.object = sc.src)
SELECT DISTINCT subject, predicate, object FROM (
    SELECT * FROM expanded
    UNION ALL SELECT * FROM types
    UNION ALL SELECT * FROM super_types
    UNION ALL SELECT src, '{SUBPROP_PRED}', dst FROM sp
    UNION ALL SELECT src, '{SUBCLASS_PRED}', dst FROM sc
    UNION ALL SELECT subject, predicate, object FROM {tbox_cte})
"""
