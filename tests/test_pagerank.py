"""PageRank correctness vs a pure-Python reference of the identical
recurrence (rank0=1, rank' = 0.15 + 0.85·Σ rank/outdeg) plus closed-form
fixed points (cycle: all-ones is exact at every iteration; star leaves
pin at 1-d after one round)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.pagerank import pagerank


def _oracle(
    edges: list[tuple[str, str]], iterations: int = 5, d: float = 0.85
) -> dict[str, float]:
    nodes = {n for e in edges for n in e}
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib: dict[str, float] = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + ranks[s] / outdeg[s]
        ranks = {n: (1.0 - d) + d * contrib.get(n, 0.0) for n in nodes}
    return ranks


def _check(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=iterations, round_to=None).collect()
    }
    want = _oracle(edges, iterations)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


def test_cycle_fixed_point(spark):
    # every node has outdeg 1 and indeg 1: 0.15 + 0.85·1 = 1 exactly
    edges = [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = pagerank(df, iterations=3, round_to=None).collect()
    assert len(rows) == 7
    assert all(r["rank"] == 1.0 for r in rows)


def test_star_and_dangling(spark):
    # leaves point at hub; hub is dangling (no out-links). Leaves receive
    # nothing -> 0.15 after round 1; hub accumulates then decays to the
    # fixed point 0.15 + 0.85·(k·0.15) once leaf ranks settle.
    edges = [(f"leaf{i}", "hub") for i in range(10)]
    _check(spark, edges, iterations=4)


def test_parallel_edges_and_self_loops(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "a"), ("c", "c"), ("b", "c")]
    _check(spark, edges, iterations=5)


def test_random_graph_matches_reference(spark):
    rng = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(40)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(160)
    ]
    _check(spark, edges, iterations=5)


def test_rounding_column(spark):
    edges = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iterations=2)
    assert out.columns == ["node", "rank"]
    # round_to=6 keeps doubles comparable across engines
    vals = {r["node"]: r["rank"] for r in out.collect()}
    assert vals == {n: round(v, 6) for n, v in _oracle(edges, 2).items()}


def test_lineage_truncated(spark):
    """Eager per-iteration checkpoints keep the returned plan O(1): the
    final DataFrame is a scan of the last checkpointed rank table (plus
    the rounding projection) — NOT an iterations-deep join tree."""
    edges = [(f"v{i}", f"v{(i * 3) % 11}") for i in range(11)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iterations=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert len(out.collect()) == 11


def _ppr_oracle(edges, seeds, iterations=5, d=0.85):
    nodes = {n for e in edges for n in e}
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    p = {n: (1.0 / len(set(seeds)) if n in seeds else 0.0) for n in nodes}
    ranks = dict(p)
    for _ in range(iterations):
        contrib: dict[str, float] = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + ranks[s] / outdeg[s]
        ranks = {
            n: (1.0 - d) * p[n] + d * contrib.get(n, 0.0) for n in nodes
        }
    return ranks


def test_personalized_matches_reference_and_unreachable_is_zero(spark):
    # two components: seeds live in the chain a->b->c; x<->y is
    # unreachable from the seed set and must converge to exactly 0
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, iterations=4, round_to=None, personalize=["a", "b"]
        ).collect()
    }
    want = _ppr_oracle(edges, {"a", "b"}, iterations=4)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-12, (n, got[n], want[n])
    assert got["x"] == 0.0 and got["y"] == 0.0


def test_personalized_empty_seeds_raises(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, personalize=[])


def test_global_case_unchanged_by_teleport_refactor(spark):
    # p ≡ 1 must reproduce the classic recurrence bit-for-bit
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 9}") for i in range(9)]
    _check(spark, edges, iterations=3)
