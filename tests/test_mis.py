"""Deterministic Luby MIS (operators/mis.py) vs the Python twin, the
DuckDB unrolled twin, and the independence/maximality invariants."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.mis import (
    maximal_independent_set,
    mis_py,
    mis_sql,
    mis_survivors,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(subject=str(a), object=str(b)) for a, b in pairs]
    )


def _collect(df):
    return {r["node"]: (r["in_mis"], r["round"]) for r in df.collect()}


def _random_graph(seed, n=40, m=70):
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
    ]


def test_matches_python_twin_random(spark):
    pairs = _random_graph(7)
    got = _collect(maximal_independent_set(_edges(spark, pairs)))
    assert got == mis_py(pairs)


def test_matches_duckdb_twin(spark):
    pairs = _random_graph(11, n=25, m=40)
    got = _collect(maximal_independent_set(_edges(spark, pairs)))
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)", [(a, b) for a, b in pairs]
    )
    depth = max(r for _, r in got.values())
    sql = mis_sql("SELECT src, dst FROM e", rounds=depth + 1, node_cast="")
    oracle = {
        r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()
    }
    assert got == oracle


def test_independence_and_maximality(spark):
    pairs = _random_graph(23, n=60, m=120)
    res = mis_py(pairs)
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    mis = {v for v, (f, _r) in res.items() if f == 1}
    # independence: no edge inside the MIS
    for a, b in pairs:
        assert not (a != b and a in mis and b in mis)
    # maximality: every excluded node has a MIS neighbor
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, v


def test_chain_and_star(spark):
    # chain a-b-c-d: MIS must NOT collapse to one node (the
    # over-deletion component-collapse would cause)
    got = _collect(
        maximal_independent_set(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        )
    )
    kept = {n for n, (f, _r) in got.items() if f == 1}
    assert len(kept) == 2
    # star: either the hub alone or all leaves
    got = _collect(
        maximal_independent_set(
            _edges(spark, [("hub", f"l{i}") for i in range(5)])
        )
    )
    kept = {n for n, (f, _r) in got.items() if f == 1}
    assert kept == {"hub"} or kept == {f"l{i}" for i in range(5)}


def test_self_loops_dropped(spark):
    got = _collect(
        maximal_independent_set(_edges(spark, [("a", "a"), ("a", "b")]))
    )
    assert sorted(got) == ["a", "b"]
    assert sum(f for f, _r in got.values()) == 1


def test_survivors_policy(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=str(i), text=f"d{i}") for i in range(6)]
    )
    pairs = spark.createDataFrame(
        [Row(doc_a="0", doc_b="1"), Row(doc_a="1", doc_b="2")]
    )
    kept = {r["doc_id"] for r in mis_survivors(docs, pairs).collect()}
    # untouched docs always survive
    assert {"3", "4", "5"} <= kept
    # chain 0-1-2: survivors are exactly the deterministic MIS — and
    # never fewer than 1 of the conflicted docs
    expect = {
        n for n, (f, _r) in mis_py([("0", "1"), ("1", "2")]).items() if f
    }
    assert kept & {"0", "1", "2"} == expect
    assert expect in ({"0", "2"}, {"1"})


def test_partitioning_invariance(spark):
    pairs = _random_graph(5, n=30, m=50)
    e = _edges(spark, pairs)
    a = _collect(maximal_independent_set(e.repartition(13)))
    b = _collect(maximal_independent_set(e.coalesce(1)))
    assert a == b


def test_round_cap_raises(spark):
    with pytest.raises(RuntimeError):
        maximal_independent_set(
            _edges(spark, [("a", "b")]), max_rounds=0
        )


def test_gate_graph_depth_within_oracle_unroll(spark):
    """The mis_conflict_free oracle unrolls 5 Luby rounds; MIS rounds
    are monotone (empty active set => no-op), so the oracle is exact
    iff the sf0.01 gate graph settles in <= 5. Pin via the python twin
    on the exact gate edge set."""
    sf = "/root/testdata/sf0.01"
    nation = spark.read.parquet(f"{sf}/nation.parquet").collect()
    supplier = spark.read.parquet(f"{sf}/supplier.parquet").collect()
    orders = spark.read.parquet(f"{sf}/orders.parquet").collect()
    customer = spark.read.parquet(f"{sf}/customer.parquet").collect()
    nat_region = {f"N{r['n_nationkey']}": f"R{r['n_regionkey']}" for r in nation}
    pairs = [(f"N{r['n_nationkey']}", f"R{r['n_regionkey']}") for r in nation]
    for r in supplier:
        n = f"N{r['s_nationkey']}"
        pairs.append((f"S{r['s_suppkey']}", n))
        pairs.append((f"S{r['s_suppkey']}", nat_region[n]))
    pairs += [(f"C{r['o_custkey']}", f"O{r['o_orderkey']}") for r in orders]
    pairs += [(f"C{r['c_custkey']}", f"N{r['c_nationkey']}") for r in customer]
    res = mis_py(pairs)
    depth = max(r for _f, r in res.values())
    assert depth <= 5, f"gate graph MIS depth {depth} exceeds oracle unroll"
