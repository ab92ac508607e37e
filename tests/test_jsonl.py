"""Resilient JSONL ingestion (sources/jsonl.py): valid/quarantine
split, reason labeling, schema drift, and the no-cache single-scan
plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kg_microbe_merge_spark.sources.jsonl import read_jsonl

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": 3, "text": "truncated',          # malformed JSON
    "not json at all",                            # malformed JSON
    '{"doc_id": 4, "lang": "de"}',                # missing required text
    '{"doc_id": 5, "text": "drift ok"}',          # lang missing: drift, OK
    "",                                           # blank: ignored
    '{"doc_id": null, "text": "no id", "lang": "en"}',  # missing doc_id
]


@pytest.fixture()
def jsonl_file(tmp_path):
    p = os.path.join(tmp_path, "part-000.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(LINES) + "\n")
    return p


def test_valid_quarantine_split(spark, jsonl_file):
    valid, quarantine = read_jsonl(
        spark, jsonl_file, SCHEMA, required=["doc_id", "text"]
    )
    v = {r["doc_id"]: r for r in valid.collect()}
    assert set(v) == {1, 2, 5}
    assert v[5]["lang"] is None  # schema drift passes as NULL
    assert valid.columns == ["doc_id", "text", "lang"]

    # the caller's schema object must not grow a _corrupt field
    assert [f.name for f in SCHEMA.fields] == ["doc_id", "text", "lang"]

    q = sorted((r["reason"], r["raw"]) for r in quarantine.collect())
    reasons = [r for r, _ in q]
    assert reasons.count("malformed_json") == 2
    assert "missing:text" in reasons
    assert "missing:doc_id" in reasons
    assert len(q) == 4  # blank line not quarantined
    assert all(r["source_file"].endswith("part-000.jsonl")
               for r in quarantine.collect())


def test_required_must_exist_in_schema(spark):
    with pytest.raises(ValueError):
        read_jsonl(spark, "/nonexistent", SCHEMA, required=["nope"])


def test_single_scan_no_cache(spark, jsonl_file):
    valid, quarantine = read_jsonl(
        spark, jsonl_file, SCHEMA, required=["doc_id"]
    )
    vp = valid._jdf.queryExecution().executedPlan().toString()
    qp = quarantine._jdf.queryExecution().executedPlan().toString()
    # each branch is one text scan + row-local parse/filter: no
    # InMemoryTableScan (the PERMISSIVE-mode corrupt-column workaround
    # this module exists to avoid), no Exchange
    for plan in (vp, qp):
        assert "InMemoryTableScan" not in plan, plan
        assert "Exchange" not in plan, plan
