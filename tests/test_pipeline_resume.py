"""Pipeline checkpoint/resume + lineage metrics + end-to-end KG shape
over the synthetic web corpus.
"""

from __future__ import annotations

import json
import os

from kg_microbe_merge_spark.plans.pipeline import MANIFEST_NAME, run_pipeline

N_DOCS = 200


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    wd = str(tmp_path / "run1")
    out = run_pipeline(spark, wd, n_docs=N_DOCS, seed=42)

    # KG shape: canonical ids, provenance-preserving edges
    edges = out["edges"].collect()
    assert edges
    for r in edges[:20]:
        assert r["predicate"].startswith("biolink:")
        assert r["knowledge_source"]  # pipe-joined urls
    nodes = out["nodes"].collect()
    node_ids = {r["id"] for r in nodes}
    for r in edges[:20]:
        assert r["subject"] in node_ids and r["object"] in node_ids

    # canonicalization collapsed SRCA/SRCB duplicates: linked entity ids
    # resolve to the SRCA (lexicographically smaller) namespace
    assert not [i for i in node_ids if i.startswith("SRCB:")]

    # no over-merge: weak (prior 0.1) ambiguous aliases must NOT chain
    # adjacent entities together — each component is exactly SRCA:i↔SRCB:i,
    # so every SRCA id maps to itself
    mapping = {r["node"]: r["component"] for r in out["mapping"].collect()}
    for node, comp in mapping.items():
        num = node.split(":")[1]
        assert comp == f"SRCA:{num}", f"over-merged: {node} -> {comp}"

    # manifest written, one entry per stage
    manifest = json.load(open(os.path.join(wd, MANIFEST_NAME)))
    for stage in ("corpus", "extracted", "triples", "linked",
                  "components", "canonical_triples", "kgx_edges", "kgx_nodes"):
        assert stage in manifest and manifest[stage]["rows"] >= 0

    # per-partition lineage metrics exist
    metrics = spark.read.parquet(os.path.join(wd, "_metrics", "triples"))
    assert {"partition_id", "rows", "stage"} <= set(metrics.columns)

    # edges are materialized partitioned by predicate -> a predicate
    # filter prunes at the file-listing level (PartitionFilters), no
    # data files of other predicates are read
    some_pred = edges[0]["predicate"]
    filtered = out["edges"].filter(out["edges"].predicate == some_pred)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "predicate" in plan

    # resume: mutate manifest wall_sec marker, re-run, stages skipped
    # (same fingerprint -> committed snapshots reused, manifest unchanged)
    before = json.load(open(os.path.join(wd, MANIFEST_NAME)))
    out2 = run_pipeline(spark, wd, n_docs=N_DOCS, seed=42)
    after = json.load(open(os.path.join(wd, MANIFEST_NAME)))
    assert before == after, "resume must not recompute committed stages"
    assert out2["edges"].count() == out["edges"].count()

    # changed fingerprint (different n_docs) recomputes
    out3 = run_pipeline(spark, wd, n_docs=N_DOCS // 2, seed=42)
    after3 = json.load(open(os.path.join(wd, MANIFEST_NAME)))
    assert after3["corpus"]["fingerprint"] != after["corpus"]["fingerprint"]
    assert out3["corpus"].count() == N_DOCS // 2


def test_stage_commit_single_post_write_scan(spark, tmp_path, monkeypatch):
    """A stage commit with a metrics key must make exactly ONE pass over
    the committed snapshot: the row count comes from sum(rows) of the
    written per-partition metrics, never a separate count() (which at
    100 TB would be a second full scan per stage)."""
    import pyspark.sql as psql

    from kg_microbe_merge_spark.plans.pipeline import PipelineRun

    run = PipelineRun(spark, str(tmp_path / "wd"))
    counts = {"n": 0}
    orig = psql.DataFrame.count

    def counting(self):
        counts["n"] += 1
        return orig(self)

    monkeypatch.setattr(psql.DataFrame, "count", counting)
    df = run.stage(
        "s1",
        lambda: spark.range(100).withColumnRenamed("id", "k"),
        "fp1",
        metrics_key="k",
    )
    assert counts["n"] == 0, "stage() called DataFrame.count despite metrics"
    assert run.manifest["s1"]["rows"] == 100
    metrics = spark.read.parquet(str(tmp_path / "wd" / "_metrics" / "s1"))
    rows = metrics.agg({"rows": "sum"}).collect()[0][0]
    assert rows == 100
    assert df.columns == ["k"]
