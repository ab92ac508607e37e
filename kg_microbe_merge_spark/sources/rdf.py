"""RDF N-Triples export/import for the merged KG.

The reference's query surface speaks SPARQL against remote endpoints
(kg_microbe_merge/query.py:9-23) — the interchange format of that
world is RDF. This module lets a merged KGX graph round-trip to
N-Triples (the line-oriented, concatenation-safe RDF syntax — the one
format that maps 1:1 onto a distributed text sink), so the local BGP
engine (plans/bgp.py) and any external triple store see the same graph.

Mapping (KGX → RDF):

* edge rows → ``<iri(subject)> <iri(predicate)> <iri(object)> .``
* node rows → ``<iri(id)> <rdfs:label> "name" .`` and
  ``<iri(id)> <rdf:type> <iri(category)> .`` (skipped when NULL)

CURIEs become IRIs by prefixing ``base`` (default
``https://kg.example/``); characters N-Triples forbids inside IRIs
(space, angle brackets, quotes, braces, pipe, caret, backtick,
backslash) are percent-encoded; literal strings get the standard
``\\`` / ``\"`` / newline / CR / tab escapes. Everything is built from
JVM-side ``concat`` / ``translate`` / ``regexp_replace`` — zero Python
in the row path; the writer is the distributed text sink (one part
file per partition, concatenation-safe by construction of the format).

100 TB shape: a pure map over the edge/node scans — no shuffle, no
driver materialization; ``single_file`` exists only for golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

#: chars the N-Triples grammar forbids in IRIREF (besides controls)
_IRI_BAD = ' <>"{}|^`\\'


def _iri(col: F.Column, base: str) -> F.Column:
    """CURIE/id → absolute IRI string with forbidden chars
    percent-encoded. '%' is encoded first so existing escapes survive
    the round trip."""
    s = col.cast("string")
    s = F.regexp_replace(s, "%", "%25")
    for ch in _IRI_BAD:
        hexcode = f"%{ord(ch):02X}"
        s = F.regexp_replace(s, "\\" + ch if ch in "\\^|{}" else ch, hexcode)
    return F.concat(F.lit("<"), F.lit(base), s, F.lit(">"))


def _literal(col: F.Column) -> F.Column:
    """String column → quoted N-Triples literal with ECHAR escapes."""
    s = col.cast("string")
    s = F.regexp_replace(s, "\\\\", "\\\\\\\\")
    s = F.regexp_replace(s, '"', '\\\\"')
    s = F.regexp_replace(s, "\n", "\\\\n")
    s = F.regexp_replace(s, "\r", "\\\\r")
    s = F.regexp_replace(s, "\t", "\\\\t")
    return F.concat(F.lit('"'), s, F.lit('"'))


def edges_to_ntriples(
    edges: DataFrame, base: str = "https://kg.example/"
) -> DataFrame:
    """One ``ntriple`` string row per edge (NULL-endpoint rows are
    dropped — N-Triples has no NULL)."""
    e = edges.filter(
        F.col("subject").isNotNull()
        & F.col("predicate").isNotNull()
        & F.col("object").isNotNull()
    )
    return e.select(
        F.concat_ws(
            " ",
            _iri(F.col("subject"), base),
            _iri(F.col("predicate"), base),
            _iri(F.col("object"), base),
            F.lit("."),
        ).alias("ntriple")
    )


def nodes_to_ntriples(
    nodes: DataFrame, base: str = "https://kg.example/"
) -> DataFrame:
    """Label + type triples for every node (NULL name/category rows
    contribute only the triples they can)."""
    n = nodes.filter(F.col("id").isNotNull())
    labels = n.filter(F.col("name").isNotNull()).select(
        F.concat_ws(
            " ",
            _iri(F.col("id"), base),
            F.concat(F.lit("<"), F.lit(RDFS_LABEL), F.lit(">")),
            _literal(F.col("name")),
            F.lit("."),
        ).alias("ntriple")
    )
    types = n.filter(F.col("category").isNotNull()).select(
        F.concat_ws(
            " ",
            _iri(F.col("id"), base),
            F.concat(F.lit("<"), F.lit(RDF_TYPE), F.lit(">")),
            _iri(F.col("category"), base),
            F.lit("."),
        ).alias("ntriple")
    )
    return labels.unionByName(types)


def write_ntriples(
    triples: DataFrame, path: str, single_file: bool = False
) -> None:
    """Distributed text sink (default: one ``.nt`` part per partition —
    N-Triples is concatenation-safe). ``single_file`` coalesces for
    golden tests only."""
    out = triples.coalesce(1) if single_file else triples
    out.write.mode("overwrite").text(path)


_NT_LINE = r'^<([^>]*)> <([^>]*)> (<[^>]*>|"(?:[^"\\]|\\.)*") \.\s*$'


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file back to ``(subject, predicate, object,
    object_is_literal)`` — the round-trip test oracle and an ingest
    path for external RDF. Pure regexp over a text scan (malformed
    lines and comments are dropped); IRI percent-escapes and literal
    ECHARs are NOT decoded — callers joining against exported data see
    identical encoded forms on both sides."""
    parsed = (
        spark.read.text(path)
        .select(
            F.regexp_extract("value", _NT_LINE, 1).alias("subject"),
            F.regexp_extract("value", _NT_LINE, 2).alias("predicate"),
            F.regexp_extract("value", _NT_LINE, 3).alias("_obj"),
        )
        .filter(F.col("subject") != "")
    )
    # both <iri> and "literal" shed one delimiter char on each side
    return parsed.select(
        "subject",
        "predicate",
        F.expr("substring(_obj, 2, length(_obj) - 2)").alias("object"),
        F.col("_obj").startswith('"').alias("object_is_literal"),
    )
