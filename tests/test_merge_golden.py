"""Golden-parity tests for the KGX merge semantics — ports of the
reference's end-to-end merge assertions
(/root/reference/tests/test_duckdb_utils.py:40-92) onto DataFrames,
plus coverage-check and priority-dedup semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.merge import (
    coverage_check,
    edge_endpoint_ids,
    edges_merge,
    edges_merge_provenance,
    infer_category,
    nodes_merge,
    priority_dedup,
)

from .kgx_fixtures import (
    EDGE_COLUMNS,
    EDGES_FILE_1,
    EDGES_FILE_2_WITH_ID,
    EXPECTED_EDGES_DISTINCT,
    EXPECTED_EDGES_PROVENANCE,
    EXPECTED_NODES_MERGED,
    NODE_COLUMNS,
    NODES_FILE_1,
    NODES_FILE_2,
    PRIORITY_SOURCES,
)


@pytest.fixture(scope="module")
def combined_nodes(spark):
    schema = ", ".join(f"{c} string" for c in NODE_COLUMNS)
    rows = [tuple(r[c] for c in NODE_COLUMNS) for r in NODES_FILE_1 + NODES_FILE_2]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def combined_edges(spark):
    schema = ", ".join(f"{c} string" for c in EDGE_COLUMNS)
    # file 2's uuid id column is dropped at load (reference behavior)
    rows = list(EDGES_FILE_1) + [tuple(r[1:]) for r in EDGES_FILE_2_WITH_ID]
    return spark.createDataFrame(rows, schema)


def _rows_as_dicts(df):
    return [r.asDict() for r in df.collect()]


@pytest.mark.parametrize("salt_buckets", [1, 4])
def test_nodes_merge_golden(spark, combined_nodes, salt_buckets):
    got = _rows_as_dicts(
        nodes_merge(combined_nodes, PRIORITY_SOURCES, salt_buckets=salt_buckets)
    )
    want = [{c: r[c] for c in NODE_COLUMNS} for r in EXPECTED_NODES_MERGED]
    assert got == want


def test_nodes_merge_row_count_equals_distinct_ids(combined_nodes):
    merged = nodes_merge(combined_nodes, PRIORITY_SOURCES)
    assert merged.count() == combined_nodes.select("id").distinct().count()


def test_edges_merge_distinct_golden(combined_edges):
    got = [tuple(r) for r in edges_merge(combined_edges).collect()]
    assert got == EXPECTED_EDGES_DISTINCT


def test_edges_merge_provenance_golden(combined_edges):
    got = [tuple(r) for r in edges_merge_provenance(combined_edges).collect()]
    assert got == EXPECTED_EDGES_PROVENANCE


def test_coverage_check_missing_endpoints(spark, combined_nodes, combined_edges):
    missing = coverage_check(combined_nodes, combined_edges).collect()
    ids = [r["id"] for r in missing]
    node_ids = {r["id"] for r in combined_nodes.select("id").collect()}
    endpoint_ids = {r["id"] for r in edge_endpoint_ids(combined_edges).collect()}
    assert set(ids) == endpoint_ids - node_ids
    assert ids == sorted(ids)
    by_id = {r["id"]: r["category"] for r in missing}
    # prefix inference (reference edge_vs_node_check.py:7-20)
    assert by_id["CHEBI:15377"] == "Unknown"
    assert "NCBITaxon:1933880" not in by_id  # present in nodes


def test_infer_category_prefixes(spark):
    df = spark.createDataFrame(
        [("EC:1.1.1.1",), ("UniprotKB:XYZ",), ("assay:foo",), ("medium:2",),
         ("carbon_substrates:x",), ("trophic_type:t",), ("cell_shape:c",),
         ("CHEBI:1",)],
        "id string",
    ).withColumn("category", infer_category(F.col("id")))
    got = {r["id"]: r["category"] for r in df.collect()}
    assert got == {
        "EC:1.1.1.1": "biolink:Enzyme",
        "UniprotKB:XYZ": "biolink:Enzyme",
        "assay:foo": "biolink:PhenotypicQuality",
        "trophic_type:t": "biolink:BiologicalProcess",
        "cell_shape:c": "biolink:PhenotypicQuality",
        "medium:2": "biolink:ChemicalEntity",
        "carbon_substrates:x": "biolink:ChemicalEntity",
        "CHEBI:1": "Unknown",
    }


def test_priority_dedup_base_table_wins(spark):
    df = spark.createDataFrame(
        [
            ("X:1", "from-base", "base"),
            ("X:1", "from-subset", "subset"),
            ("X:2", "only-subset", "subset"),
        ],
        "id string, payload string, source_table string",
    )
    winners = priority_dedup(
        df, keys=["id"], base_table="base", tiebreak_cols=["payload"]
    )
    got = {r["id"]: r["payload"] for r in winners.collect()}
    assert got == {"X:1": "from-base", "X:2": "only-subset"}
    losers = priority_dedup(
        df, keys=["id"], base_table="base", keep_winners=False,
        tiebreak_cols=["payload"],
    )
    assert [tuple(r)[:2] for r in losers.collect()] == [("X:1", "from-subset")]


def test_nodes_merge_null_vs_empty_distinction(spark):
    """NULL-padded missing columns stay NULL after merge (reference
    NULL-pads at load, duckdb_utils.py:255-258); a genuine empty string
    survives as a value."""
    df = spark.createDataFrame(
        [("A:1", None, "n1", None), ("A:1", "", "n1", None)],
        "id string, category string, name string, provided_by string",
    )
    row = nodes_merge(df, []).collect()[0]
    assert row["category"] == ""  # the empty string is a real value
    assert row["provided_by"] is None  # all-NULL group stays NULL


def test_skew_aware_matches_plain(spark):
    """nodes_merge_skew_aware must be value-identical to nodes_merge on
    the golden fixtures regardless of which ids are classified heavy."""
    from kg_microbe_merge_spark.operators.merge import (
        nodes_merge,
        nodes_merge_skew_aware,
    )
    from tests.kgx_fixtures import NODE_COLUMNS, NODES_FILE_1, NODES_FILE_2, PRIORITY_SOURCES

    rows = [tuple(r[c] for c in NODE_COLUMNS) for r in NODES_FILE_1 + NODES_FILE_2]
    schema = ", ".join(f"{c} string" for c in NODE_COLUMNS)
    df = spark.createDataFrame(rows, schema)
    plain = nodes_merge(df, PRIORITY_SOURCES).collect()
    # threshold 0 -> every id routed through the salted branch
    aware = nodes_merge_skew_aware(df, PRIORITY_SOURCES, heavy_threshold=0).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, aware))


def test_sort_output_false_has_no_global_sort(spark):
    """Pipelines feeding partitioned writes pass sort_output=False: the
    physical plan must contain no total-order Sort/rangepartitioning
    exchange; the default (golden parity) keeps the global sort."""
    from kg_microbe_merge_spark.operators.merge import edges_merge, nodes_merge

    nodes = spark.createDataFrame(
        [("A:1", "c", "n", "s")],
        "id string, category string, name string, provided_by string",
    )
    edges = spark.createDataFrame(
        [("A:1", "p", "A:2")], "subject string, predicate string, object string"
    )
    for df in (
        nodes_merge(nodes, [], sort_output=False),
        edges_merge(edges, sort_output=False),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan, plan
        assert "Sort [" not in plan, plan
    sorted_plan = (
        nodes_merge(nodes, [])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Sort [" in sorted_plan
