"""HyperBall neighborhood estimation (operators/hyperball.py)."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.hyperball import (
    HB_P,
    effective_diameter_py,
    hyperball,
    neighborhood_function,
)
from kg_microbe_merge_spark.operators.sketches import _hll_alpha


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], ["subject", "object"]
    )


def _balls_py(pairs, max_t, directed):
    """Exact BFS balls per node (python twin of the set semantics)."""
    adj: dict[str, set[str]] = {}
    nodes = set()
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        nodes.update((a, b))
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    balls = {}
    for v in nodes:
        ball = {v}
        frontier = {v}
        balls[(v, 0)] = set(ball)
        for t in range(1, max_t + 1):
            frontier = {
                w for u in frontier for w in adj.get(u, ())
            } - ball
            ball |= frontier
            balls[(v, t)] = set(ball)
    return balls


def _est_micro_py(members, p=HB_P):
    """Register twin: exact est_micro the engines must both produce
    for a ball with exactly these members."""
    import math

    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    regs = [0] * m
    for x in members:
        h = hash60_py(str(x))
        reg = h >> reg_bits
        w = h & ((1 << reg_bits) - 1)
        rho = r_max if w == 0 else r_max - w.bit_length()
        regs[reg] = max(regs[reg], rho)
    z = sum(1 << (r_max - r) for r in regs)
    numerator = _hll_alpha(m) * m * m * float(1 << r_max)
    return math.floor(numerator / float(z) * 1e6 + 0.5)


@pytest.mark.parametrize("directed", [False, True])
def test_matches_exact_register_twin(spark, directed):
    import random

    rng = random.Random(3)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    got = {
        (r["node"], r["t"]): r["est_micro"]
        for r in hyperball(
            _edges_df(spark, pairs), max_t=3, directed=directed
        ).collect()
    }
    exact = _balls_py(pairs, 3, directed)
    assert set(got) == set(exact)
    for key, members in exact.items():
        assert got[key] == _est_micro_py(members), key


def test_directed_chain_out_balls(spark):
    pairs = [("a", "b"), ("b", "c")]
    got = {
        (r["node"], r["t"]): r["est_micro"]
        for r in hyperball(
            _edges_df(spark, pairs), max_t=2, directed=True
        ).collect()
    }
    # out-ball semantics: a reaches everything, c reaches only itself
    assert got[("a", 2)] == _est_micro_py({"a", "b", "c"})
    assert got[("c", 1)] == got[("c", 0)] == _est_micro_py({"c"})


def test_monotone_and_stabilizes_at_diameter(spark):
    pairs = [(i, i + 1) for i in range(5)]  # path, diameter 5
    rows = hyperball(_edges_df(spark, pairs), max_t=7).collect()
    by_node: dict[str, dict[int, int]] = {}
    for r in rows:
        by_node.setdefault(r["node"], {})[r["t"]] = r["est_micro"]
    for ests in by_node.values():
        seq = [ests[t] for t in sorted(ests)]
        assert all(a <= b for a, b in zip(seq, seq[1:]))
        assert seq[5] == seq[6] == seq[7]  # saturated at the diameter


def test_accuracy_on_large_star(spark):
    n = 4000
    pairs = [("hub", f"leaf{i}") for i in range(n)]
    rows = {
        (r["node"], r["t"]): r["est"]
        for r in hyperball(_edges_df(spark, pairs), max_t=1).collect()
    }
    est = rows[("hub", 1)]
    sigma = 1.04 / (1 << HB_P) ** 0.5  # ~9.2% relative
    assert abs(est - (n + 1)) < 5 * sigma * (n + 1), est


def test_neighborhood_function_and_effective_diameter(spark):
    from kg_microbe_merge_spark.operators.sketches import (
        hll_corrected_estimate_py,
    )

    pairs = [(i, i + 1) for i in range(5)]
    balls = hyperball(_edges_df(spark, pairs), max_t=7)
    rows = balls.collect()
    nf = {
        r["t"]: r["nf_micro"]
        for r in neighborhood_function(balls).collect()
    }
    exact = _balls_py(pairs, 7, False)
    for t in range(8):
        want = sum(
            _est_micro_py(exact[(v, t)]) for v in {str(i) for i in range(6)}
        )
        assert nf[t] == want
    # effective diameter needs the small-range correction (raw HLL is
    # ~alpha*m-biased on tiny balls) — apply it driver-side from the
    # (zeros, z_scaled) columns, then interpolate. True median path
    # distance growth saturates at t=5 on a 6-node path.
    corrected: dict[int, float] = {}
    for r in rows:
        corrected[r["t"]] = corrected.get(r["t"], 0.0) + (
            hll_corrected_estimate_py(r["zeros"], r["z_scaled"], HB_P)
        )
    d = effective_diameter_py(
        [(t, int(v * 1e6)) for t, v in corrected.items()]
    )
    assert 0 < d <= 5.0
    # corrected per-ball estimates are accurate on these tiny sets
    for r in rows:
        true = len(exact[(r["node"], r["t"])])
        got = hll_corrected_estimate_py(r["zeros"], r["z_scaled"], HB_P)
        assert abs(got - true) <= max(1.0, 0.25 * true), (r, true, got)


def test_negative_max_t_rejected(spark):
    with pytest.raises(ValueError):
        hyperball(_edges_df(spark, [("a", "b")]), max_t=-1)
