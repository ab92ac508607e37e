"""Plan-shape assertions for the round-3b operators (link prediction,
line-level boilerplate dedup, RDF export) — pinning their PLANS.md
scale claims: shuffle keys carry hashes/ids, never text; no cartesian
products; export is a pure map."""

from __future__ import annotations

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.dedup import remove_boilerplate_lines
from kg_microbe_merge_spark.operators.linkpred import link_prediction_scores
from kg_microbe_merge_spark.sources.rdf import edges_to_ntriples


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_linkpred_no_cartesian_reused_dedup_broadcast_degrees(spark):
    edges = spark.createDataFrame(
        [Row(subject=f"s{i % 7}", object=f"o{i % 11}") for i in range(60)]
    )
    df = link_prediction_scores(edges)
    df.collect()  # the FINAL adaptive plan is the scale-relevant one
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    # wedge self-join is an equi-join on the center z
    assert "hashpartitioning(z" in plan, plan
    # the edge-dedup subtree appears ~8x in the static plan (und feeds
    # nbrs twice, deg, centers, the anti join) — AQE exchange reuse must
    # collapse the duplicates so the distinct computes ONCE
    assert "ReusedExchange" in plan, plan
    # existing-edge removal + degree joins broadcast at dimension size
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_line_dedup_exchanges_never_carry_text(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared line one\nunique {i}\nshared two")
         for i in range(12)]
    )
    df = remove_boilerplate_lines(docs)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # shuffle keys: (hash, doc) distinct, hash doc-freq, doc_id rebuild
    # — NO exchange partitions on the raw line text
    ex_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex_lines, plan
    assert all("_line" not in l for l in ex_lines), ex_lines
    # flagged-hash set broadcasts into the semi join at runtime (AQE)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_rdf_export_is_pure_map(spark):
    edges = spark.createDataFrame(
        [Row(subject="a", predicate="p", object="b")]
    )
    plan = _plan(edges_to_ntriples(edges))
    assert "Exchange" not in plan, plan
