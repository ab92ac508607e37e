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


# --- expectation mining ----------------------------------------------


def _summary_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "subject_category string, predicate string, "
        "object_category string, n_edges long, n_subjects long, "
        "n_objects long",
    )


def test_mine_expectations_majority_and_thresholds(spark):
    from kg_microbe_merge_spark.operators.validate import mine_expectations

    rows = [
        # rel:a — clean: Gene→Disease 9 of 10, Gene→Chemical 1
        ("Gene", "rel:a", "Disease", 9, 5, 4),
        ("Gene", "rel:a", "Chemical", 1, 1, 1),
        # rel:b — subject side ambiguous 5/5 → below 60% confidence
        ("Gene", "rel:b", "Disease", 5, 3, 3),
        ("Chemical", "rel:b", "Disease", 5, 2, 2),
        # rel:c — majority object is Unknown → dropped
        ("Gene", "rel:c", "Unknown", 8, 4, 4),
        ("Gene", "rel:c", "Disease", 2, 2, 2),
        # rel:d — below min_support
        ("Gene", "rel:d", "Disease", 2, 1, 1),
    ]
    out = mine_expectations(
        _summary_df(spark, rows),
        min_support=3,
        min_confidence_micro=600_000,
    ).collect()
    got = {
        r["predicate"]: (
            r["subject_category"], r["object_category"], r["n_edges"],
            r["subject_confidence_micro"], r["object_confidence_micro"],
        )
        for r in out
    }
    assert got == {"rel:a": ("Gene", "Disease", 10, 1_000_000, 900_000)}


def test_mine_expectations_tie_break_and_duckdb_twin(spark):
    import duckdb

    from kg_microbe_merge_spark.operators.validate import (
        mine_expectations,
        mine_expectations_sql,
    )

    rows = [
        # exact tie 4/4 on the subject side → lexicographically first
        # category wins; confidence 500k passes the default threshold
        ("Beta", "rel:t", "X", 4, 2, 2),
        ("Alpha", "rel:t", "X", 4, 2, 2),
    ]
    out = mine_expectations(_summary_df(spark, rows)).collect()
    assert [(r["predicate"], r["subject_category"],
             r["subject_confidence_micro"]) for r in out] == [
        ("rel:t", "Alpha", 500_000)
    ]
    vals = ", ".join(
        f"('{a}', '{p}', '{b}', {n}, {s}, {o})"
        for a, p, b, n, s, o in rows
    )
    twin = duckdb.sql(mine_expectations_sql(
        "SELECT * FROM (VALUES " + vals + ") t(subject_category, "
        "predicate, object_category, n_edges, n_subjects, n_objects)"
    )).fetchall()
    assert [tuple(r) for r in twin] == [
        (r["predicate"], r["subject_category"], r["object_category"],
         r["n_edges"], r["subject_confidence_micro"],
         r["object_confidence_micro"])
        for r in out
    ]


def test_mined_expectations_feed_enforcement(spark):
    # mine on a trusted snapshot, enforce on a delta containing a
    # violation — the discovery→validation loop end to end
    from kg_microbe_merge_spark.operators.stats import schema_summary
    from kg_microbe_merge_spark.operators.validate import (
        domain_range_violations,
        mine_expectations,
    )

    nodes = spark.createDataFrame(
        [("g1", "Gene"), ("g2", "Gene"), ("d1", "Disease"),
         ("d2", "Disease"), ("c1", "Chemical")],
        "id string, category string",
    )
    trusted = spark.createDataFrame(
        [("g1", "affects", "d1"), ("g2", "affects", "d1"),
         ("g1", "affects", "d2")],
        "subject string, predicate string, object string",
    )
    exp = mine_expectations(schema_summary(nodes, trusted))
    delta = spark.createDataFrame(
        [("g1", "affects", "c1"), ("g2", "affects", "d2")],
        "subject string, predicate string, object string",
    )
    v = domain_range_violations(delta, nodes, exp).collect()
    assert [(r["subject"], r["object"], r["end"], r["actual_category"])
            for r in v] == [("g1", "c1", "object", "Chemical")]
