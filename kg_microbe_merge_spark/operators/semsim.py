"""Ontology semantic similarity — corpus-based information content
(IC) and Resnik / Lin term similarity over the subsumption closure.

Why this belongs in a KG-construction engine: entity linking and
cross-source ID reconciliation constantly need "how close are these
two ontology terms?" — mapping a mention typed ``Syndrome`` against a
candidate typed ``Disease``, scoring an ER match whose two sides carry
sibling Biolink categories, or ontology-alignment QA after the merge.
The reference's flat prefix→category map (`/root/reference/
kg_microbe_merge/utils/edge_vs_node_check.py:7-20`) can only say
equal/unequal; IC similarity grades the hierarchy.

Definitions (Resnik 1995, Lin 1998):

    freq(c)  = #entities annotated to c or ANY descendant of c
    IC(c)    = -ln(freq(c) / N)          (N = total annotated entities)
    Resnik(a,b) = IC(MICA)               (most informative common ancestor)
    Lin(a,b)    = 2·IC(MICA) / (IC(a) + IC(b))

Float protocol (the repo's cross-engine rule): IC is pinned to
integer micro-nats, ``ic_micro = floor(-ln(freq/N)·1e6 + 0.5)`` — the
inputs are exact integers, the division and ``ln`` see identical IEEE
doubles in Spark and DuckDB, and the floor(+0.5) round-half kills the
last-ulp ambiguity. Lin is then defined ON the micro integers
(``floor(2e6·mica/(ic_a+ic_b) + 0.5)``), so both engines divide the
same exact BIGINTs. Degenerate convention: ``IC(a)+IC(b) = 0`` (both
terms are the root — zero information either side) → ``lin_micro = 0``,
same shape as the NPMI degenerate rule in operators/collocations.py.

100 TB shape (annotations are the big side; the ontology is tiny):

* ``information_content``: ONE join of the annotation table against
  the broadcast reflexive closure (term → ancestor), then a
  count-distinct per ancestor — the join explodes each annotation by
  its ancestor-chain depth (≤ ~10 for Biolink-like ontologies), and
  the aggregation is partially map-side combined. No self-joins.
* ``resnik_similarity`` / ``lin_similarity``: the PAIRS table chooses
  the cost. Each pair joins twice against the broadcast closure and
  aggregates max over common ancestors — per pair the candidate rows
  are |anc(a)| × matches, bounded by ontology depth², and the pairs
  themselves are whatever bounded candidate set the caller's blocking
  produced (ER candidates, LSH buckets — never all-terms²).
* Closures come in as plain DataFrames (from
  :func:`..closure.transitive_closure`) so callers compute them once
  per ontology release and reuse across every scoring run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def reflexive(closure: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """closure ∪ identity — every term is its own ancestor (MICA of a
    term with itself must be the term). Input is (src=term,
    dst=ancestor) pairs; the identity side covers every id seen on
    either end, so leaves and the root both self-map."""
    terms = (
        closure.select(F.col(src_col).alias("t"))
        .unionByName(closure.select(F.col(dst_col).alias("t")))
        .distinct()
    )
    return (
        closure.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .unionByName(terms.select(F.col("t").alias("src"), F.col("t").alias("dst")))
        .distinct()
    )


def information_content(
    annotations: DataFrame,
    closure_reflexive: DataFrame,
    term_col: str = "term",
    entity_col: str = "entity",
) -> DataFrame:
    """(term, freq, ic_micro) for every term in the reflexive closure.
    ``freq`` counts DISTINCT entities annotated to the term or any
    descendant (an entity annotated twice under one subtree counts
    once); N is the distinct annotated-entity total. Terms whose
    subtree has no annotations get no row (IC undefined — the caller's
    join drops unscorable pairs, which is the honest outcome)."""
    ann = annotations.select(
        F.col(entity_col).alias("entity"), F.col(term_col).alias("term")
    ).filter(F.col("entity").isNotNull() & F.col("term").isNotNull())
    n_total = ann.select("entity").distinct().count()
    if n_total == 0:
        raise ValueError("information_content: no annotations")
    freq = (
        ann.join(
            F.broadcast(closure_reflexive),
            ann["term"] == closure_reflexive["src"],
        )
        .groupBy(F.col("dst").alias("term"))
        .agg(F.countDistinct("entity").alias("freq"))
    )
    ic = F.floor(
        -F.log(F.col("freq").cast("double") / F.lit(float(n_total)))
        * F.lit(MICRO)
        + F.lit(0.5)
    ).cast("bigint")
    return freq.select("term", "freq", ic.alias("ic_micro"))


def resnik_similarity(
    pairs: DataFrame,
    closure_reflexive: DataFrame,
    ic: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(a, b, resnik_micro) = max IC over the common ancestors of each
    pair. Pairs without a common SCORED ancestor drop (disconnected
    terms / unannotated subtrees have no defined MICA). Two broadcast
    closure joins + one broadcast IC join + a max agg per pair."""
    anc_a = closure_reflexive.select(
        F.col("src").alias("_a"), F.col("dst").alias("_anc")
    )
    anc_b = closure_reflexive.select(
        F.col("src").alias("_b"), F.col("dst").alias("_anc_b")
    )
    p = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    common = (
        p.join(F.broadcast(anc_a), p["a"] == anc_a["_a"])
        .join(
            F.broadcast(anc_b),
            (F.col("b") == anc_b["_b"]) & (F.col("_anc") == anc_b["_anc_b"]),
        )
        .select("a", "b", F.col("_anc").alias("anc"))
    )
    scored = common.join(
        F.broadcast(ic.select(F.col("term").alias("anc"), "ic_micro")),
        "anc",
    )
    return scored.groupBy("a", "b").agg(
        F.max("ic_micro").alias("resnik_micro")
    )


def lin_similarity(
    pairs: DataFrame,
    closure_reflexive: DataFrame,
    ic: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(a, b, resnik_micro, lin_micro) with Lin computed on the micro-
    integer ICs (see module docstring). Pairs where either end has no
    IC row drop with the same no-defined-score semantics as Resnik."""
    res = resnik_similarity(pairs, closure_reflexive, ic, a_col, b_col)
    ic_a = ic.select(F.col("term").alias("a"), F.col("ic_micro").alias("_ic_a"))
    ic_b = ic.select(F.col("term").alias("b"), F.col("ic_micro").alias("_ic_b"))
    out = (
        res.join(F.broadcast(ic_a), "a")
        .join(F.broadcast(ic_b), "b")
        .select(
            "a",
            "b",
            "resnik_micro",
            F.when(F.col("_ic_a") + F.col("_ic_b") == 0, F.lit(0))
            .otherwise(
                F.floor(
                    F.lit(2.0 * MICRO)
                    * F.col("resnik_micro").cast("double")
                    / (F.col("_ic_a") + F.col("_ic_b")).cast("double")
                    + F.lit(0.5)
                )
            )
            .cast("bigint")
            .alias("lin_micro"),
        )
    )
    return out


def ic_sql(ann_cte: str, closure_cte: str) -> str:
    """DuckDB twin of :func:`information_content` over CTEs providing
    (entity, term) and the REFLEXIVE (src, dst) closure. Yields CTE
    text for ``ic(term, freq, ic_micro)`` — embed inside a WITH."""
    return f"""
        ic AS (
            SELECT c.dst AS term,
                   count(DISTINCT a.entity) AS freq,
                   CAST(floor(-ln(count(DISTINCT a.entity)::DOUBLE /
                        (SELECT count(DISTINCT entity) FROM {ann_cte})::DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS ic_micro
            FROM {ann_cte} a JOIN {closure_cte} c ON a.term = c.src
            WHERE a.entity IS NOT NULL AND a.term IS NOT NULL
            GROUP BY c.dst)
    """


def lin_sql(pairs_cte: str, closure_cte: str) -> str:
    """DuckDB twin of :func:`lin_similarity` (includes Resnik): final
    SELECT over CTEs providing (a, b), the reflexive closure, and the
    ``ic`` CTE from :func:`ic_sql`."""
    return f"""
        SELECT r.a, r.b, r.resnik_micro,
               CASE WHEN ia.ic_micro + ib.ic_micro = 0 THEN 0
                    ELSE CAST(floor(2000000.0 * r.resnik_micro /
                         (ia.ic_micro + ib.ic_micro)::DOUBLE + 0.5) AS BIGINT)
               END AS lin_micro
        FROM (
            SELECT p.a, p.b, max(ic.ic_micro) AS resnik_micro
            FROM {pairs_cte} p
            JOIN {closure_cte} ca ON p.a = ca.src
            JOIN {closure_cte} cb ON p.b = cb.src AND ca.dst = cb.dst
            JOIN ic ON ic.term = ca.dst
            GROUP BY p.a, p.b) r
        JOIN ic ia ON ia.term = r.a
        JOIN ic ib ON ib.term = r.b
    """
