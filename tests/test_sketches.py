"""HyperLogLog + Count-Min sketch tests (operators/sketches.py):
python-twin equality, mergeability (the semigroup property that makes
the sketches map-side-combinable), accuracy bounds, the one-sided
Count-Min guarantee, the sampled candidate path, and plan shapes
(bounded-state exchanges, broadcast probe join)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.sketches import (
    cms_counters,
    cms_estimates,
    cms_heavy_hitters,
    cms_merge,
    cms_py,
    hll_corrected_estimate_py,
    hll_distinct,
    hll_merge,
    hll_py,
    hll_registers,
    histogram_merge,
    log_histogram,
    quantile_sketch,
    quantile_sketch_py,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _items(n: int, tag: str = "x") -> list[str]:
    return [f"{tag}-{i}" for i in range(n)]


# --- HyperLogLog ----------------------------------------------------------


def test_hll_matches_python_twin(spark):
    items = _items(3000)
    df = spark.createDataFrame([Row(g="a", item=x) for x in items])
    row = hll_distinct(df, "item", ["g"], p=9).collect()[0]
    zeros, z_scaled, est_micro = hll_py(items, p=9)
    assert (row.zeros, row.z_scaled, row.est_micro) == (
        zeros,
        z_scaled,
        est_micro,
    )


def test_hll_accuracy_across_cardinalities(spark):
    # corrected estimate within 5 sigma (5 * 1.04 / sqrt(512) = 23%)
    # of the true cardinality — generous enough to be flake-free with
    # the deterministic hash, tight enough to catch register bugs
    for n in (300, 2000, 20000):
        df = spark.createDataFrame(
            [Row(g="g", item=x) for x in _items(n, f"c{n}")]
        )
        row = hll_distinct(df, "item", ["g"], p=9).collect()[0]
        est = hll_corrected_estimate_py(row.zeros, row.z_scaled, p=9)
        assert abs(est - n) / n < 0.23, (n, est)


def test_hll_duplicates_do_not_move_registers(spark):
    once = spark.createDataFrame([Row(item=x) for x in _items(500)])
    thrice = spark.createDataFrame(
        [Row(item=x) for x in _items(500) * 3]
    )
    a = {(r.reg, r.rho) for r in hll_registers(once, "item").collect()}
    b = {(r.reg, r.rho) for r in hll_registers(thrice, "item").collect()}
    assert a == b


def test_hll_merge_equals_union_sketch(spark):
    xs, ys = _items(800, "l"), _items(800, "r")
    df_x = spark.createDataFrame([Row(item=x) for x in xs])
    df_y = spark.createDataFrame([Row(item=y) for y in ys])
    df_u = spark.createDataFrame([Row(item=z) for z in xs + ys])
    merged = {
        (r.reg, r.rho)
        for r in hll_merge(
            hll_registers(df_x, "item"), hll_registers(df_y, "item")
        ).collect()
    }
    whole = {(r.reg, r.rho) for r in hll_registers(df_u, "item").collect()}
    assert merged == whole


def test_hll_bounded_exchanges(spark):
    df = spark.createDataFrame([Row(g="g", item=x) for x in _items(100)])
    plan = _plan(hll_distinct(df, "item", ["g"], p=9))
    # register agg + estimate agg: two shuffles, both partial-aggregated
    # (map side emits <= m rows per group), nothing else
    assert plan.count("Exchange") == 2, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan


# --- Count-Min ------------------------------------------------------------


def _stream() -> list[str]:
    # skewed stream: 5 heavy items (>= 60), 200 singletons
    out: list[str] = []
    for i, h in enumerate(("alpha", "beta", "gamma", "delta", "epsilon")):
        out += [h] * (60 + 10 * i)
    out += _items(200, "tail")
    return out


def test_cms_matches_python_twin(spark):
    items = _stream()
    df = spark.createDataFrame([Row(item=x) for x in items])
    counters = {
        (r.row, r.col): r.cnt
        for r in cms_counters(df, "item", width=256).collect()
    }
    py_counters, _ = cms_py(items, width=256)
    assert counters == py_counters


def test_cms_one_sided_and_exact_when_sparse(spark):
    items = _stream()
    df = spark.createDataFrame([Row(item=x) for x in items])
    counters = cms_counters(df, "item")  # 4 x 1024: sparse for 205 items
    est = {
        r.item: r.est
        for r in cms_estimates(counters, df, "item").collect()
    }
    true = Counter(items)
    assert set(est) == set(true)
    for it, c in true.items():
        assert est[it] >= c, it
    # with 205 items in 4x1024 cells, the min over 4 rows is almost
    # always collision-free; require >= 95% exact
    exact = sum(est[i] == c for i, c in true.items())
    assert exact / len(true) >= 0.95


def test_cms_heavy_hitters_contains_all_true(spark):
    items = _stream()
    df = spark.createDataFrame([Row(item=x) for x in items])
    hh = {r.item: r.est for r in cms_heavy_hitters(df, "item", 60).collect()}
    true_hh = {i for i, c in Counter(items).items() if c >= 60}
    assert true_hh <= set(hh)  # one-sided: never misses a true HH
    for it, est in hh.items():
        assert est >= 60


def test_cms_sampled_candidates_subset(spark):
    items = _stream()
    df = spark.createDataFrame([Row(item=x) for x in items])
    full = {r.item for r in cms_heavy_hitters(df, "item", 60).collect()}
    sampled = {
        r.item
        for r in cms_heavy_hitters(
            df, "item", 60, candidate_mod=2
        ).collect()
    }
    # sampling prunes candidates, never adds: output is a subset, and
    # with threshold 60 >> mod 2 every true HH survives w.h.p. — the
    # deterministic hash makes this exact, not flaky
    assert sampled <= full
    assert len(sampled) >= 1


def test_cms_merge_equals_union_sketch(spark):
    items = _stream()
    half = len(items) // 2
    df_a = spark.createDataFrame([Row(item=x) for x in items[:half]])
    df_b = spark.createDataFrame([Row(item=x) for x in items[half:]])
    df_u = spark.createDataFrame([Row(item=x) for x in items])
    merged = {
        (r.row, r.col): r.cnt
        for r in cms_merge(
            cms_counters(df_a, "item"), cms_counters(df_b, "item")
        ).collect()
    }
    whole = {
        (r.row, r.col): r.cnt for r in cms_counters(df_u, "item").collect()
    }
    assert merged == whole


# --- log-binned quantile histogram ---------------------------------------


def _values():
    # deterministic long-tailed lengths incl. 0 and small exact region
    return [0, 1, 7, 15] + [((i * 37) % 97 + 1) * (1 + i % 13) for i in range(1500)]


def test_quantiles_match_python_twin(spark):
    vals = _values()
    df = spark.createDataFrame([Row(g="g", v=v) for v in vals], "g string, v long")
    got = {r.q: r.est for r in quantile_sketch(df, "v", ["g"]).collect()}
    assert got == quantile_sketch_py(vals)


def test_quantiles_relative_error_bound(spark):
    vals = sorted(_values())
    df = spark.createDataFrame([Row(v=v) for v in vals], "v long")
    got = {r.q: r.est for r in quantile_sketch(df, "v").collect()}
    import math

    for q in (0.5, 0.9, 0.99):
        exact = vals[math.ceil(q * len(vals)) - 1]
        # est is the bin lower bound containing the true quantile:
        # est <= exact < est * (1 + 2^-4) (+1 for the exact region)
        assert got[q] <= exact, (q, got[q], exact)
        assert exact <= got[q] * (1 + 1 / 16) + 1, (q, got[q], exact)


def test_histogram_merge_equals_union(spark):
    vals = _values()
    df = spark.createDataFrame([Row(v=v) for v in vals], "v long")
    h1 = log_histogram(df.filter("v % 2 = 0"), "v")
    h2 = log_histogram(df.filter("v % 2 = 1"), "v")
    merged = {(r.bin): r.cnt for r in histogram_merge(h1, h2).collect()}
    whole = {(r.bin): r.cnt for r in log_histogram(df, "v").collect()}
    assert merged == whole


def test_histogram_bounded_state(spark):
    # 1500 distinct-ish values collapse into a bounded bin set, and the
    # aggregation is map-side partial (the scale claim)
    df = spark.createDataFrame([Row(v=v) for v in _values()], "v long")
    hist = log_histogram(df, "v")
    assert hist.count() < 200
    plan = _plan(hist)
    assert plan.count("Exchange") == 1, plan
    assert "partial_count" in plan, plan


def test_cms_plan_shapes(spark):
    df = spark.createDataFrame([Row(item=x) for x in _items(50)])
    # counters: probe explode is row-local, ONE shuffle (partial count)
    cplan = _plan(cms_counters(df, "item"))
    assert cplan.count("Exchange hashpartitioning") == 1, cplan
    assert "CartesianProduct" not in cplan
    # estimation: the counter table is broadcast — query items never
    # shuffle against it
    eplan = _plan(cms_estimates(cms_counters(df, "item"), df, "item"))
    assert "BroadcastHashJoin" in eplan, eplan
