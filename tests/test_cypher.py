"""Cypher-subset compiler (plans/cypher.py): node/label match, typed
relationship chains, WHERE predicates, RETURN projections/count/
DISTINCT/ORDER BY/LIMIT — the local analogue of the reference's
kg-chat Neo4j passthrough (reference run.py:276-381)."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.plans.cypher import CypherError, cypher_query


def _kg(spark):
    nodes = spark.createDataFrame(
        [
            ("G:1", "biolink:Gene", "alpha"),
            ("G:2", "biolink:Gene", "beta"),
            ("D:1", "biolink:Disease", "flu"),
            ("C:1", "biolink:ChemicalEntity", "aspirin"),
        ],
        "id string, category string, name string",
    )
    edges = spark.createDataFrame(
        [
            ("G:1", "biolink:related_to", "D:1"),
            ("G:2", "biolink:related_to", "D:1"),
            ("C:1", "biolink:treats", "D:1"),
            ("G:1", "biolink:interacts_with", "G:2"),
        ],
        "subject string, predicate string, object string",
    )
    return nodes, edges


def test_match_all_nodes_limit(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(nodes, edges, "MATCH (n) RETURN n LIMIT 10")
    rows = out.collect()
    assert len(rows) == 4
    assert set(out.columns) == {"n_id", "n_category", "n_name"}


def test_label_and_property_projection(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes, edges, "MATCH (g:Gene) RETURN g.name AS name ORDER BY name"
    )
    assert [r["name"] for r in out.collect()] == ["alpha", "beta"]


def test_typed_relationship_chain(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (g:Gene)-[:related_to]->(d:Disease) "
        "RETURN g.id AS gene, d.name AS disease ORDER BY gene",
    )
    assert [(r["gene"], r["disease"]) for r in out.collect()] == [
        ("G:1", "flu"),
        ("G:2", "flu"),
    ]


def test_reversed_arrow(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (d:Disease)<-[:treats]-(c) RETURN c.id AS chem",
    )
    assert [r["chem"] for r in out.collect()] == ["C:1"]


def test_where_and_count(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (g)-[r]->(d:Disease) WHERE g.category = 'biolink:Gene' "
        "RETURN r AS pred, count(*) AS n",
    )
    assert [(r["pred"], r["n"]) for r in out.collect()] == [
        ("biolink:related_to", 2)
    ]


def test_where_contains_and_rel_var(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (a)-[r]->(b) WHERE r.type CONTAINS 'interacts' "
        "RETURN a.id AS s, b.id AS o",
    )
    assert [(r["s"], r["o"]) for r in out.collect()] == [("G:1", "G:2")]


def test_two_hop_chain(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (a)-[:interacts_with]->(b)-[:related_to]->(d) "
        "RETURN a.id AS a, d.id AS d",
    )
    assert [(r["a"], r["d"]) for r in out.collect()] == [("G:1", "D:1")]


def test_distinct(spark):
    nodes, edges = _kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[]->(d:Disease) RETURN DISTINCT d.id AS d",
    )
    assert [r["d"] for r in out.collect()] == ["D:1"]


def test_unsupported_raises(spark):
    nodes, edges = _kg(spark)
    for bad in (
        "CREATE (n)",
        "MATCH (a)-[r]-(b) RETURN a",          # undirected
        "MATCH (n) RETURN n.nope",              # unknown property
        "MATCH (n) WHERE q.id = 'x' RETURN n",  # unknown variable
    ):
        with pytest.raises(CypherError):
            cypher_query(nodes, edges, bad).collect()


def test_matches_duckdb_oracle(spark):
    """Cross-engine check: the compiled plan equals a hand-written SQL
    twin on the same data."""
    import duckdb

    nodes, edges = _kg(spark)
    got = cypher_query(
        nodes,
        edges,
        "MATCH (g:Gene)-[:related_to]->(d) "
        "RETURN g.name AS gname, d.id AS did ORDER BY gname",
    ).collect()
    con = duckdb.connect()
    con.register("nodes", nodes.toPandas())
    con.register("edges", edges.toPandas())
    want = con.sql("""
        SELECT n.name AS gname, e.object AS did
        FROM edges e JOIN nodes n ON n.id = e.subject
        WHERE e.predicate = 'biolink:related_to'
          AND n.category = 'biolink:Gene'
        ORDER BY gname
    """).fetchall()
    assert [(r["gname"], r["did"]) for r in got] == want


# --- variable-length relationships -----------------------------------


def _chain_kg(spark):
    # a -> b -> c -> d  (next), plus a shortcut a -> c (skip)
    nodes = spark.createDataFrame(
        [(x, "biolink:Thing", x.upper()) for x in "abcd"],
        "id string, category string, name string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "next", "b"),
            ("b", "next", "c"),
            ("c", "next", "d"),
            ("a", "skip", "c"),
        ],
        "subject string, predicate string, object string",
    )
    return nodes, edges


def test_var_length_bounded_range(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[:next*1..2]->(y) RETURN x.id AS x, y.id AS y",
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c"), ("c", "d"),
                   ("a", "c"), ("b", "d")}


def test_var_length_exact_and_unbounded(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges, "MATCH (x)-[:next*2]->(y) RETURN x.id AS x, y.id AS y"
    )
    assert {(r["x"], r["y"]) for r in out.collect()} == {
        ("a", "c"), ("b", "d")
    }
    out = cypher_query(
        nodes, edges, "MATCH (x)-[:next*]->(y) RETURN x.id AS x, y.id AS y"
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")}


def test_var_length_lower_bound_unbounded(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[:next*2..]->(y) RETURN x.id AS x, y.id AS y",
    )
    assert {(r["x"], r["y"]) for r in out.collect()} == {
        ("a", "c"), ("a", "d"), ("b", "d")
    }


def test_var_length_zero_includes_identity(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[:skip*0..1]->(y) RETURN x.id AS x, y.id AS y",
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "c")} | {(n, n) for n in "abcd"}


def test_var_length_untyped_and_chain_composition(spark):
    nodes, edges = _chain_kg(spark)
    # any-type var-length into a typed fixed hop: x -*1..2-> y -next-> d
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[*1..2]->(y)-[:next]->(z) "
        "WHERE z.id = 'd' RETURN x.id AS x, y.id AS y",
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    # y=c via next-paths a->b->c, b->c, a->c(skip); all with z=d
    assert got == {("a", "c"), ("b", "c")}


def test_var_length_reversed_arrow(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)<-[:next*1..3]-(y) WHERE x.id = 'd' "
        "RETURN y.id AS y ORDER BY y",
    )
    assert [r["y"] for r in out.collect()] == ["a", "b", "c"]


def test_var_length_count_aggregation(spark):
    nodes, edges = _chain_kg(spark)
    out = cypher_query(
        nodes, edges,
        "MATCH (x)-[:next*1..3]->(y) RETURN x.id AS x, count(*) AS n "
        "ORDER BY x",
    )
    assert [(r["x"], r["n"]) for r in out.collect()] == [
        ("a", 3), ("b", 2), ("c", 1)
    ]


def test_var_length_guards(spark):
    nodes, edges = _chain_kg(spark)
    with pytest.raises(CypherError, match="bind"):
        cypher_query(nodes, edges,
                     "MATCH (x)-[r:next*1..2]->(y) RETURN x.id")
    with pytest.raises(CypherError, match="out of order"):
        cypher_query(nodes, edges,
                     "MATCH (x)-[:next*3..2]->(y) RETURN x.id")
    with pytest.raises(CypherError, match="> 16"):
        cypher_query(nodes, edges,
                     "MATCH (x)-[:next*1..30]->(y) RETURN x.id")
