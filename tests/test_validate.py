"""SHACL-lite KG validation (operators/validate.py): domain/range over
pipe-joined categories, cardinality bounds, CURIE grammar, DuckDB twin."""

from __future__ import annotations

import duckdb

from kg_microbe_merge_spark.operators.validate import (
    cardinality_violations,
    curie_violations,
    domain_range_violations,
    domain_range_sql,
)

NODES = [
    ("G:1", "biolink:Gene"),
    ("G:2", "biolink:Gene|biolink:Protein"),
    ("D:1", "biolink:Disease"),
    ("X:1", "biolink:ChemicalEntity"),
]
EDGES = [
    ("G:1", "assoc", "D:1"),     # conformant
    ("G:2", "assoc", "D:1"),     # conformant via multi-valued category
    ("D:1", "assoc", "D:1"),     # subject violation (Disease, not Gene)
    ("G:1", "assoc", "X:1"),     # object violation (Chemical, not Disease)
    ("G:1", "assoc", "MISSING:9"),  # object missing -> NULL actual
    ("X:1", "other", "G:1"),     # unconstrained predicate: not checked
]
EXPECT = [("assoc", "biolink:Gene", "biolink:Disease")]


def _frames(spark):
    nodes = spark.createDataFrame(NODES, "id string, category string")
    edges = spark.createDataFrame(
        EDGES, "subject string, predicate string, object string"
    )
    expect = spark.createDataFrame(
        EXPECT,
        "predicate string, subject_category string, object_category string",
    )
    return nodes, edges, expect


def test_domain_range(spark):
    nodes, edges, expect = _frames(spark)
    got = sorted(
        tuple(r)
        for r in domain_range_violations(edges, nodes, expect).collect()
    )
    assert got == sorted(
        [
            ("D:1", "assoc", "D:1", "subject", "biolink:Gene",
             "biolink:Disease"),
            ("G:1", "assoc", "X:1", "object", "biolink:Disease",
             "biolink:ChemicalEntity"),
            ("G:1", "assoc", "MISSING:9", "object", "biolink:Disease",
             None),
        ]
    )


def test_domain_range_duckdb_twin(spark):
    nodes, edges, expect = _frames(spark)
    got = sorted(
        tuple(r)
        for r in domain_range_violations(edges, nodes, expect).collect()
    )
    con = duckdb.connect()
    con.register("nodes_t", nodes.toPandas())
    con.register("edges_t", edges.toPandas())
    con.register("expect_t", expect.toPandas())
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            domain_range_sql("edges_t", "nodes_t", "expect_t")
        ).fetchall()
    )
    assert got == oracle


def test_cardinality(spark):
    edges = spark.createDataFrame(
        [
            ("a", "one_of", "x"), ("a", "one_of", "y"),
            ("a", "one_of", "y"),  # duplicate object: counted once
            ("b", "one_of", "x"),
            ("a", "many_of", "x"), ("a", "many_of", "y"),
        ],
        "subject string, predicate string, object string",
    )
    bounds = spark.createDataFrame(
        [("one_of", 1)], "predicate string, max_out long"
    )
    got = [
        tuple(r) for r in cardinality_violations(edges, bounds).collect()
    ]
    assert got == [("a", "one_of", 2, 1)]


def test_curie(spark):
    nodes = spark.createDataFrame(
        [("GO:0001",), ("nocolon",), (":nolocal",), ("bad id:x",),
         ("p:with|pipe",), ("UniProtKB:P12345",), (None,)],
        "id string",
    )
    got = {r["id"] for r in curie_violations(nodes).collect()}
    assert got == {"nocolon", ":nolocal", "bad id:x", "p:with|pipe", None}


def test_schema_summary(spark):
    """Quotient-graph schema summary (operators/stats.schema_summary):
    counts per type-edge, distinct endpoints, Unknown for missing or
    NULL-category endpoints, DuckDB twin."""
    import duckdb

    from kg_microbe_merge_spark.operators.stats import (
        schema_summary,
        schema_summary_sql,
    )

    nodes = [
        ("g1", "Gene"), ("g2", "Gene"), ("d1", "Disease"), ("x1", None),
    ]
    edges = [
        ("g1", "causes", "d1"),
        ("g2", "causes", "d1"),
        ("g1", "causes", "missing"),
        ("x1", "rel", "g1"),
    ]
    n = spark.createDataFrame(nodes, "id string, category string")
    e = spark.createDataFrame(
        edges, "subject string, predicate string, object string"
    )
    got = {
        (r["subject_category"], r["predicate"], r["object_category"]): (
            r["n_edges"], r["n_subjects"], r["n_objects"],
        )
        for r in schema_summary(n, e).collect()
    }
    assert got == {
        ("Gene", "causes", "Disease"): (2, 2, 1),
        ("Gene", "causes", "Unknown"): (1, 1, 1),
        ("Unknown", "rel", "Gene"): (1, 1, 1),
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE n (id VARCHAR, category VARCHAR)")
    con.executemany("INSERT INTO n VALUES (?, ?)", nodes)
    con.execute(
        "CREATE TABLE e (subject VARCHAR, predicate VARCHAR, object VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    oracle = {
        (a, p, b): (ne, ns, no)
        for a, p, b, ne, ns, no in con.execute(
            schema_summary_sql("n", "e")
        ).fetchall()
    }
    assert got == oracle
