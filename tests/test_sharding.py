"""Size-balanced sharding (operators/sharding.py): python-model
equivalence, shard-size bounds, partitioning invariance, guards, and
the two-level plan shape (no global-order window)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.sharding import assign_shards


def _rows(n, size=lambda i: 100 + (i * 37) % 400):
    return [Row(doc_id=i, n_chars=size(i)) for i in range(n)]


def _expected(rows, shard_bytes, n_buckets=64, salt="shard"):
    keyed = sorted(
        (hash60_py(f"{r.doc_id}:{salt}") % n_buckets,
         hash60_py(f"{r.doc_id}:{salt}"), r.doc_id, r.n_chars)
        for r in rows
    )
    out, acc = {}, 0
    for _, _, doc_id, b in keyed:
        out[doc_id] = acc // shard_bytes
        acc += b
    return out


def test_matches_python_model(spark):
    rows = _rows(300)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(
            spark.createDataFrame(rows), shard_bytes=5000
        ).collect()
    }
    assert got == _expected(rows, 5000)


def test_shard_byte_totals_balanced(spark):
    rows = _rows(500)
    out = assign_shards(
        spark.createDataFrame(rows), shard_bytes=8000
    ).collect()
    totals = {}
    for r in out:
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_chars"]
    max_row = max(r.n_chars for r in rows)
    last = max(totals)
    for s, t in totals.items():
        assert t < 8000 + max_row
        if s != last:
            assert t > 8000 - max_row
    assert set(totals) == set(range(last + 1))  # no empty shards


def test_partitioning_invariant(spark):
    rows = _rows(200)
    df = spark.createDataFrame(rows)
    a = sorted(
        (r["doc_id"], r["shard_id"])
        for r in assign_shards(df, 4000, n_buckets=8).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard_id"])
        for r in assign_shards(df.repartition(11), 4000, n_buckets=8).collect()
    )
    assert a == b


def test_oversized_row_owns_shards(spark):
    # hash order of ids 0-7 under salt "shard" is [3,5,1,4,0,2,7,6]:
    # the 25 kB giant (id 0) sits mid-order, so id 2 right after it
    # must start 25 shards later — floor arithmetic, no blocking
    rows = [Row(doc_id=i, n_chars=25_000 if i == 0 else 10) for i in range(8)]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["shard_id"] for r in assign_shards(df, 1000).collect()}
    assert out == _expected(rows, 1000)
    assert out[2] == (4 * 10 + 25_000) // 1000 == 25


def test_guards(spark):
    df = spark.createDataFrame(_rows(5))
    with pytest.raises(ValueError):
        assign_shards(df, 0)
    with pytest.raises(ValueError):
        assign_shards(df, 100, n_buckets=0)


def test_no_global_order_window(spark):
    df = spark.createDataFrame(_rows(100))
    plan = (
        assign_shards(df, 2000, n_buckets=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the running sum must be per-bucket (hashpartitioning window) with
    # a broadcast offset join — never a single-partition global sort
    # cumsum (SinglePartition exchange) and never a shuffle join
    assert "rangepartitioning" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "hashpartitioning(_bucket" in plan, plan
